from easyrec_tpu.retrieval.knn import KnnIndex, topk_search  # noqa: F401

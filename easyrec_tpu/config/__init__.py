from easyrec_tpu.config.config_util import (  # noqa: F401
    EasyRecConfig,
    edit_config,
    expand_input_paths,
    get_configs_from_pipeline_file,
    get_configs_from_pipeline_str,
    get_feature_configs,
    save_pipeline_config,
)

"""Backbone DSL: declarative block-DAG composite models.

Mirrors the reference's easy_rec/python/layers/backbone.py (Package DAG,
Block inputs with input_fn/input_slice, lambda / keras_layer / recurrent /
repeat layers, EnhancedInputLayer options, top_mlp) re-expressed as one
flax module — every block becomes inlined submodules inside a single
jitted program, so XLA fuses across block boundaries.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from easyrec_tpu.layers.dnn import MLP as MLPLayer
from easyrec_tpu.layers.keras_registry import build_keras_layer
from easyrec_tpu.utils.dag import DAG


class _TFShim:
  """Minimal tf.* namespace so reference-style lambda expressions
  ('lambda x: tf.concat(x, axis=1)') evaluate against jnp."""

  concat = staticmethod(lambda values, axis=-1: jnp.concatenate(
      values, axis=axis))
  stack = staticmethod(jnp.stack)
  expand_dims = staticmethod(jnp.expand_dims)
  squeeze = staticmethod(jnp.squeeze)
  reshape = staticmethod(jnp.reshape)
  transpose = staticmethod(jnp.transpose)
  reduce_mean = staticmethod(lambda x, axis=None, keepdims=False:
                             jnp.mean(x, axis=axis, keepdims=keepdims))
  reduce_sum = staticmethod(lambda x, axis=None, keepdims=False:
                            jnp.sum(x, axis=axis, keepdims=keepdims))
  reduce_max = staticmethod(lambda x, axis=None, keepdims=False:
                            jnp.max(x, axis=axis, keepdims=keepdims))
  sigmoid = staticmethod(jax.nn.sigmoid)
  tanh = staticmethod(jnp.tanh)
  exp = staticmethod(jnp.exp)
  log = staticmethod(jnp.log)
  abs = staticmethod(jnp.abs)
  square = staticmethod(jnp.square)
  sqrt = staticmethod(jnp.sqrt)
  add_n = staticmethod(lambda xs: sum(xs))
  multiply = staticmethod(jnp.multiply)
  unstack = staticmethod(lambda x, axis=0: [
      jnp.squeeze(v, axis=axis)
      for v in jnp.split(x, x.shape[axis], axis=axis)])
  divide = staticmethod(jnp.divide)
  split = staticmethod(lambda x, num, axis=-1: jnp.split(x, num, axis=axis))
  gather = staticmethod(lambda x, ids, axis=0: jnp.take(x, ids, axis=axis))
  norm = staticmethod(jnp.linalg.norm)
  ones_like = staticmethod(jnp.ones_like)
  zeros_like = staticmethod(jnp.zeros_like)
  stop_gradient = staticmethod(jax.lax.stop_gradient)
  nn = jax.nn
  math = jnp


_LAMBDA_ENV = {
    'jnp': jnp, 'jax': jax, 'np': np, 'tf': _TFShim,
    'concatenate': jnp.concatenate,
}


def eval_lambda(expression: str):
  """Evaluate a config lambda string in a restricted namespace."""
  # the env must be the GLOBALS dict so the lambda body resolves names at
  # call time (locals are not captured by lambdas created in eval)
  env = dict(_LAMBDA_ENV)
  env['__builtins__'] = {'len': len, 'sum': sum, 'min': min, 'max': max,
                         'range': range, 'abs': abs, 'list': list,
                         'tuple': tuple, 'zip': zip, 'enumerate': enumerate}
  return eval(expression, env)  # noqa: S307


def _apply_slice(value, slice_str: str):
  if not slice_str:
    return value
  return eval('__x__' + slice_str.strip(),  # noqa: S307
              {'__builtins__': {}, '__x__': value})


def _flatten(values: List[Any]) -> List[Any]:
  out = []
  for v in values:
    if isinstance(v, (list, tuple)):
      out.extend(v)
    else:
      out.append(v)
  return out


def _merge(values: List[Any], axis: int):
  if len(values) == 1:
    return values[0]
  # list-valued inputs merge into one flat LIST, not a concat — blocks
  # like Gate/CDN wrap tensors via input_fn "lambda x: [x]" and rely on
  # this (reference backbone.py merge_inputs:532-550)
  if any(isinstance(v, (list, tuple)) for v in values):
    return _flatten(values)
  return jnp.concatenate(values, axis=axis)


class Package(nn.Module):
  """One (sub-)DAG of blocks. The top-level backbone is itself a Package
  with packages available for reference (reference backbone.py:22-120).

  Calling the same Package instance multiple times shares parameters —
  this is how the reference reuses packages for contrastive branches.
  """
  ctx: Any
  pkg_config: Any                      # BlockPackage or BackboneTower proto
  packages: Dict[str, 'Package'] = None

  def _package_outer_deps(self, pkg_name: str, outer_blocks,
                          seen=None) -> set:
    """Outer-block names a package (transitively) reads: inner blocks may
    reference backbone blocks directly (reference backbone.py:163-167
    registers these as backbone-dag edges) and package_input may chain to
    another package."""
    seen = seen if seen is not None else set()
    if pkg_name in seen or pkg_name not in (self.packages or {}):
      return set()
    seen.add(pkg_name)
    cfg = self.packages[pkg_name].pkg_config
    inner = {b.name for b in cfg.blocks}
    deps = set()
    for b in cfg.blocks:
      for bi in b.inputs:
        which = bi.WhichOneof('name')
        if which == 'block_name' and bi.block_name not in inner and \
                bi.block_name in outer_blocks:
          deps.add(bi.block_name)
        elif which == 'package_name':
          deps |= self._package_outer_deps(bi.package_name, outer_blocks,
                                           seen)
          if bi.package_input:
            if bi.package_input in outer_blocks:
              deps.add(bi.package_input)
            else:
              deps |= self._package_outer_deps(bi.package_input,
                                               outer_blocks, seen)
    return deps

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False,
               package_input=None, outer_values=None):
    blocks = {b.name: b for b in self.pkg_config.blocks}
    group_names = set(self.ctx.groups)

    dag = DAG()
    for b in self.pkg_config.blocks:
      dag.add_node(b.name)
      for bi in b.inputs:
        which = bi.WhichOneof('name')
        if which == 'block_name' and bi.block_name in blocks:
          dag.add_edge(bi.block_name, b.name)
        elif which == 'feature_group_name' and \
                bi.feature_group_name in blocks and \
                bi.feature_group_name != b.name:
          # a block may be named after a feature group it wraps
          dag.add_edge(bi.feature_group_name, b.name)
        elif which == 'package_name':
          if bi.package_input in blocks:
            # the package's input is computed by another block: order it
            dag.add_edge(bi.package_input, b.name)
          else:
            for dep in self._package_outer_deps(bi.package_input, blocks):
              dag.add_edge(dep, b.name)
          for dep in self._package_outer_deps(bi.package_name, blocks):
            dag.add_edge(dep, b.name)

    values: Dict[str, Any] = {}
    group_cache: Dict[str, Any] = {}

    def feature_group_value(gname: str):
      if gname not in group_cache:
        names = self.ctx.group_features(gname)
        group_cache[gname] = self.ctx.input_layer.group_concat(
            pulled, batch, names)
      return group_cache[gname]

    def resolve_input(bi, block_name: str):
      which = bi.WhichOneof('name')
      if which == 'feature_group_name':
        gname = bi.feature_group_name
        if gname in blocks and gname != block_name:
          v = values[gname]
        else:
          v = feature_group_value(gname)
      elif which == 'block_name':
        if bi.block_name in values:
          v = values[bi.block_name]
        elif outer_values is not None and bi.block_name in outer_values:
          # an inner-package block may read an outer backbone block
          # (reference Package.backbone_block_outputs)
          v = outer_values[bi.block_name]
        else:
          v = values[bi.block_name]          # KeyError with block name
      elif which == 'package_name':
        pkg = (self.packages or {}).get(bi.package_name)
        if pkg is None:
          raise KeyError('unknown package %r' % bi.package_name)
        ov = dict(outer_values or {})
        ov.update(values)
        pkg_in = None
        if bi.package_input:
          # NB: no `or` fallback — truthiness of a traced array crashes
          if bi.package_input in values:
            pkg_in = values[bi.package_input]
          elif bi.package_input in (self.packages or {}):
            # package_input naming another PACKAGE: run it and feed its
            # output (reference backbone.py:233-238)
            pkg_in = self.packages[bi.package_input](
                batch, pulled, training, outer_values=ov)
          else:
            pkg_in = feature_group_value(bi.package_input)
          if bi.package_input_fn:
            pkg_in = eval_lambda(bi.package_input_fn)(pkg_in)
        v = pkg(batch, pulled, training, package_input=pkg_in,
                outer_values=ov)
      elif which == 'use_package_input':
        if package_input is None:
          raise ValueError('block %r uses package input but none was '
                           'passed' % block_name)
        v = package_input
      else:
        raise ValueError('block input needs a name (block %r)' % block_name)
      if bi.ignore_input:
        return None
      if bi.input_slice:
        v = _apply_slice(v, bi.input_slice)
      if bi.input_fn:
        v = eval_lambda(bi.input_fn)(v)
      return v

    for bname in dag.topological_sort():
      block = blocks[bname]
      values[bname] = self._run_block(block, resolve_input,
                                      feature_group_value, batch, pulled,
                                      training)

    out_blocks = list(self.pkg_config.output_blocks)
    if out_blocks:
      outs = [values[n] for n in out_blocks]
      return outs if len(outs) > 1 else outs[0]
    concat = list(self.pkg_config.concat_blocks) or \
        dag.leaf_nodes([b.name for b in self.pkg_config.blocks])
    if len(concat) == 1 and isinstance(values[concat[0]], (list, tuple)):
      # a single list-valued output (e.g. SeqAugment's [seq, mask, ...])
      # keeps its structure — flattening it into a 2d concat would feed
      # downstream consumers (BST target slots) garbage
      return list(values[concat[0]])
    outs = _flatten([values[n] for n in concat])
    outs = [o if o.ndim == 2 else o.reshape(o.shape[0], -1) for o in outs]
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]

  # -- block evaluation ------------------------------------------------------

  def _run_block(self, block, resolve_input, feature_group_value, batch,
                 pulled, training):
    which_layer = block.WhichOneof('layer')

    # input-layer blocks read their feature group directly
    if which_layer == 'input_layer':
      gname = block.inputs[0].feature_group_name \
          if block.inputs else block.name
      return self._input_layer_block(block.name, gname, block.input_layer,
                                     batch, pulled, training)
    if which_layer == 'raw_input':
      gname = block.inputs[0].feature_group_name \
          if block.inputs else block.name
      names = self.ctx.group_features(gname)
      return jnp.concatenate(
          [self.ctx.input_layer.dense_feature(batch, f) for f in names
           if self.ctx.specs[f].kind == 'dense'], axis=-1)

    inputs = [resolve_input(bi, block.name) for bi in block.inputs]
    inputs = [v for v in inputs if v is not None]
    if block.merge_inputs_into_list:
      x = _flatten(inputs)
    elif len(inputs) == 1:
      x = inputs[0]
    elif inputs:
      x = _merge(inputs, int(block.input_concat_axis))
    else:
      x = None
    if block.extra_input_fn:
      x = eval_lambda(block.extra_input_fn)(x)

    if which_layer == 'embedding_layer':
      cfg = block.embedding_layer
      ids = x.astype(jnp.int32)
      table = nn.Embed(int(cfg.vocab_size) or 10000,
                       int(cfg.embedding_dim),
                       name='%s_embed' % block.name)
      emb = table(ids)
      if cfg.concat and emb.ndim > 2:
        emb = emb.reshape(emb.shape[0], -1)
      return emb

    # sequential layers: repeated `layers` or the single-layer oneof
    layer_protos = list(block.layers)
    if which_layer is not None and which_layer not in (
        'input_layer', 'raw_input', 'embedding_layer'):
        layer_protos = layer_protos + [(which_layer,
                                      getattr(block, which_layer))]
    for idx, lp in enumerate(layer_protos):
      if isinstance(lp, tuple):
        kind, payload = lp
      else:
        kind = lp.WhichOneof('layer')
        payload = getattr(lp, kind)
      x = self._run_layer(kind, payload, x, '%s_l%d' % (block.name, idx),
                          training)
    return x

  def _run_layer(self, kind: str, payload, x, name: str, training: bool):
    if kind == 'lambda':
      return eval_lambda(payload.expression)(x)
    if kind == 'keras_layer':
      mod = build_keras_layer(payload, name)
      return mod(x, training)
    if kind == 'recurrent':
      mod = build_keras_layer(payload.keras_layer, name)
      fixed = None
      state = x
      if payload.HasField('fixed_input_index') and \
              isinstance(x, (list, tuple)):
        fi = int(payload.fixed_input_index)
        fixed = x[fi]
        rest = [v for i, v in enumerate(x) if i != fi]
        state = rest[0] if len(rest) == 1 else rest
      for _ in range(int(payload.num_steps)):
        inp = [fixed, state] if fixed is not None else state
        state = mod(inp, training)          # same instance: shared params
      return state
    if kind == 'repeat':
      outs = []
      for i in range(int(payload.num_repeat)):
        xi = x
        if payload.input_slice:
          xi = _apply_slice(xi, payload.input_slice.replace('i', str(i)))
        if payload.input_fn:
          xi = eval_lambda(payload.input_fn)(xi, i) \
              if 'lambda x, i' in payload.input_fn or \
              'lambda x,i' in payload.input_fn else \
              eval_lambda(payload.input_fn)(xi)
        mod = build_keras_layer(payload.keras_layer, '%s_r%d' % (name, i))
        outs.append(mod(xi, training))
      if payload.HasField('output_concat_axis'):
        return jnp.concatenate(outs, axis=int(payload.output_concat_axis))
      return outs
    raise ValueError('unknown layer kind %r' % kind)

  # -- enhanced input layer ---------------------------------------------------

  def _input_layer_block(self, block_name: str, gname: str, cfg, batch,
                         pulled, training: bool):
    """EnhancedInputLayer: feature group -> (optionally normalized) 2d /
    3d / per-feature-list outputs (reference layers/common_layers.py)."""
    il = self.ctx.input_layer
    names = self.ctx.group_features(gname)
    seq_names = [f for f in names if self.ctx.specs[f].kind == 'sequence']
    flat_names = [f for f in names if f not in seq_names]

    if cfg.output_seq_and_normal_feature:
      # [seq [B, L, D], mask [B, L], normal [B, D]]
      seqs, masks = [], None
      for f in seq_names:
        s, m = il.sequence_embedding(pulled, batch, f)
        seqs.append(s)
        masks = m if masks is None else jnp.maximum(masks, m)
      seq = jnp.concatenate(seqs, axis=-1) if len(seqs) > 1 else seqs[0]
      out = [seq, masks]
      if flat_names:
        out.append(il.group_concat(pulled, batch, flat_names))
      return out

    def _norm(t):
      if cfg.do_batch_norm:
        t = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         name='%s_bn' % block_name)(t)
      if cfg.do_layer_norm:
        t = nn.LayerNorm(name='%s_ln' % block_name)(t)
      if cfg.dropout_rate > 0:
        t = nn.Dropout(cfg.dropout_rate, deterministic=not training)(t)
      return t

    feature_list = il.group_embeddings(pulled, batch, names)
    mc = self.ctx.model_config
    if mc.HasField('variational_dropout'):
      from easyrec_tpu.layers.variational_dropout import VariationalDropout
      vd = mc.variational_dropout
      feature_list = VariationalDropout(
          feature_names=tuple(names),
          regularization_lambda=vd.regularization_lambda,
          embedding_wise=vd.embedding_wise_variational_dropout,
          name='%s_variational_dropout' % block_name)(feature_list,
                                                      training)
    if cfg.feature_dropout_rate > 0 and training:
      rng = self.make_rng('dropout')
      keep = jax.random.bernoulli(rng, 1.0 - cfg.feature_dropout_rate,
                                  (len(feature_list),))
      feature_list = [f * keep[i] / (1.0 - cfg.feature_dropout_rate)
                      for i, f in enumerate(feature_list)]

    if cfg.only_output_feature_list:
      return feature_list
    if cfg.only_output_3d_tensor:
      dims = {f.shape[-1] for f in feature_list}
      if len(dims) != 1:
        raise ValueError('3d output needs equal embedding dims')
      return _norm(jnp.stack(feature_list, axis=1))
    flat = jnp.concatenate(feature_list, axis=-1) \
        if len(feature_list) > 1 else feature_list[0]
    flat = _norm(flat)
    if cfg.output_2d_tensor_and_feature_list:
      # a PAIR [2d, <list>] — input_slice '[1]' selects the whole
      # per-feature list (reference common_layers.py:143)
      return [flat, feature_list]
    return flat


class BackboneModule(nn.Module):
  """Top-level backbone: packages + main DAG + top_mlp
  (reference backbone.py:482-517 Backbone)."""
  ctx: Any
  backbone: Any      # BackboneTower proto

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    packages = {}
    for pkg in self.backbone.packages:
      packages[pkg.name] = Package(self.ctx, pkg, packages=None,
                                   name='pkg_%s' % pkg.name)
    main = Package(self.ctx, self.backbone, packages=packages,
                   name='main')
    out = main(batch, pulled, training)
    if self.backbone.HasField('top_mlp') and \
            len(self.backbone.top_mlp.hidden_units):
      if isinstance(out, (list, tuple)):
        out = jnp.concatenate(_flatten(list(out)), axis=-1)
      out = MLPLayer.from_config(self.backbone.top_mlp, name='top_mlp')(
          out, training)
    return out

"""Small-L / small-head attention formulation microbench (TPU).

BST bench shapes: x [4096, 51, 32], 4 heads x head_dim 8. The stock
per-head batched matmuls are dispatch/padding-bound (PERF.md r4 variant
matrix); this bench times fwd+bwd of ISOLATED attention cores (fixed
random qkv inputs, sum-of-output loss) to rank formulations before
integrating one into layers/attention.py.

Run: python benchmarks/bench_attention.py
"""

from __future__ import annotations

import os as _os_
import sys as _sys_
import time

_sys_.path.insert(0, _os_.path.dirname(_os_.path.dirname(
    _os_.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, L, H, DH = 4096, 51, 4, 8
D = H * DH
NEG = -1e9
STEPS = 30


def stock(q, k, v, mask):
  """flax-equivalent per-head batched attention."""
  s = jnp.einsum('blhd,bmhd->bhlm', q, k) / np.sqrt(DH)
  s = jnp.where(mask[:, None, None, :] > 0, s, NEG)
  p = jax.nn.softmax(s, axis=-1)
  return jnp.einsum('bhlm,bmhd->blhd', p, v).reshape(B, L, D)


def head_minor(q, k, v, mask):
  """head as a non-major output axis (layout variant)."""
  s = jnp.einsum('blhd,bmhd->blhm', q, k) / np.sqrt(DH)
  s = jnp.where(mask[:, None, None, :] > 0, s, NEG)
  p = jax.nn.softmax(s, axis=-1)
  return jnp.einsum('blhm,bmhd->blhd', p, v).reshape(B, L, D)


def packed_eye(q, k, v, mask):
  """block-diagonal K/V expansion via einsum with I_H."""
  eye = jnp.eye(H, dtype=q.dtype)
  k_cat = jnp.einsum('bmhd,hg->bhdgm', k, eye).reshape(B, H * DH, H * L)
  s = jnp.einsum('bld,bdm->blm', q.reshape(B, L, D) / np.sqrt(DH), k_cat)
  s4 = s.reshape(B, L, H, L)
  s4 = jnp.where(mask[:, None, None, :] > 0, s4, NEG)
  p = jax.nn.softmax(s4, axis=-1)
  v_cat = jnp.einsum('bmhd,hg->bhmgd', v, eye).reshape(B, H * L, H * DH)
  out = jnp.einsum('blm,bmd->bld', p.reshape(B, L, H * L), v_cat)
  return out


def packed_concat(q, k, v, mask):
  """block-diagonal K/V built by static pad+concat (no eye einsum)."""
  scale = np.sqrt(DH)
  # k [B, M, H, DH] -> k_cat [B, H*DH, H*M] block-diagonal
  kT = jnp.transpose(k, (0, 2, 3, 1))          # [B, H, DH, M]
  blocks = []
  for h in range(H):
    z_pre = jnp.zeros((B, h * DH, L), k.dtype)
    z_post = jnp.zeros((B, (H - 1 - h) * DH, L), k.dtype)
    blocks.append(jnp.concatenate([z_pre, kT[:, h], z_post], axis=1))
  k_cat = jnp.concatenate(blocks, axis=2)      # [B, H*DH, H*M]
  s = jnp.einsum('bld,bdm->blm', q.reshape(B, L, D) / scale, k_cat)
  s4 = s.reshape(B, L, H, L)
  s4 = jnp.where(mask[:, None, None, :] > 0, s4, NEG)
  p = jax.nn.softmax(s4, axis=-1)
  vT = jnp.transpose(v, (0, 2, 1, 3))          # [B, H, M, DH]
  vb = []
  for h in range(H):
    z_pre = jnp.zeros((B, L, h * DH), v.dtype)
    z_post = jnp.zeros((B, L, (H - 1 - h) * DH), v.dtype)
    vb.append(jnp.concatenate([z_pre, vT[:, h], z_post], axis=2))
  v_cat = jnp.concatenate(vb, axis=1)          # [B, H*M, H*DH]
  return jnp.einsum('blm,bmd->bld', p.reshape(B, L, H * L), v_cat)


def h1_fullwidth(q, k, v, mask):
  """single-head full-width control (the measured-fast H=1 shape)."""
  qf, kf, vf = (t.reshape(B, L, D) for t in (q, k, v))
  s = jnp.einsum('bld,bmd->blm', qf, kf) / np.sqrt(D)
  s = jnp.where(mask[:, None, :] > 0, s, NEG)
  p = jax.nn.softmax(s, axis=-1)
  return jnp.einsum('blm,bmd->bld', p, vf)


def vpu_outer(q, k, v, mask):
  """multiply-broadcast-reduce (no dot_general): K=8 contractions as 8
  fused VPU FMAs — dodges both MXU K-padding and per-instance matmul
  dispatch, at the cost of a bigger fused elementwise footprint."""
  # scores [B, L, H, M] = sum_d q[b,l,h,d] * k[b,m,h,d]
  s = jnp.sum(q[:, :, None, :, :] * k[:, None, :, :, :],
              axis=-1).transpose(0, 1, 3, 2) / np.sqrt(DH)
  s = jnp.where(mask[:, None, None, :] > 0, s, NEG)
  p = jax.nn.softmax(s, axis=-1)
  # out [B, L, H, D] = sum_m p[b,l,h,m] * v[b,m,h,d]
  out = jnp.sum(p[:, :, :, :, None] * v[:, None, :, :, :]
                .transpose(0, 1, 3, 2, 4), axis=3)
  return out.reshape(B, L, D)


def bf16_stock(q, k, v, mask):
  s = jnp.einsum('blhd,bmhd->bhlm', q.astype(jnp.bfloat16),
                 k.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) / np.sqrt(DH)
  s = jnp.where(mask[:, None, None, :] > 0, s, NEG)
  p = jax.nn.softmax(s, axis=-1)
  out = jnp.einsum('bhlm,bmhd->blhd', p.astype(jnp.bfloat16),
                   v.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
  return out.reshape(B, L, D)


def lane_stack(q, k, v, mask):
  """heads stacked along LANES of one [B, L, H*M] matmul pair by
  pre-concatenating K along the row axis per head — equivalent to
  packed but builds k2 [B, M*H? ] ... placeholder variant: per-head
  dots with L padded to 64 lanes."""
  lp = 64
  qp = jnp.pad(q, ((0, 0), (0, lp - L), (0, 0), (0, 0)))
  kp = jnp.pad(k, ((0, 0), (0, lp - L), (0, 0), (0, 0)))
  vp = jnp.pad(v, ((0, 0), (0, lp - L), (0, 0), (0, 0)))
  mp = jnp.pad(mask, ((0, 0), (0, lp - L)))
  s = jnp.einsum('blhd,bmhd->bhlm', qp, kp) / np.sqrt(DH)
  s = jnp.where(mp[:, None, None, :] > 0, s, NEG)
  p = jax.nn.softmax(s, axis=-1)
  out = jnp.einsum('bhlm,bmhd->blhd', p, vp)[:, :L]
  return out.reshape(B, L, D)


def bh_major(q, k, v, mask):
  """(b, h)-major batch layout for the per-head matmuls."""
  q2 = q.transpose(0, 2, 1, 3)
  k2 = k.transpose(0, 2, 1, 3)
  v2 = v.transpose(0, 2, 1, 3)
  s = jnp.einsum('bhld,bhmd->bhlm', q2, k2) / np.sqrt(DH)
  s = jnp.where(mask[:, None, None, :] > 0, s, NEG)
  p = jax.nn.softmax(s, axis=-1)
  out = jnp.einsum('bhlm,bhmd->bhld', p, v2)
  return out.transpose(0, 2, 1, 3).reshape(B, L, D)


def vpu_bf16(q, k, v, mask):
  """vpu_outer with bf16 multiply payloads (halved fused-loop reads)."""
  qb = q.astype(jnp.bfloat16)
  kb = k.astype(jnp.bfloat16)
  s = jnp.sum((qb[:, :, None, :, :] * kb[:, None, :, :, :])
              .astype(jnp.float32), axis=-1).transpose(0, 1, 3, 2)
  s = s / np.sqrt(DH)
  s = jnp.where(mask[:, None, None, :] > 0, s, NEG)
  p = jax.nn.softmax(s, axis=-1)
  out = jnp.sum((p.astype(jnp.bfloat16)[:, :, :, :, None] *
                 v.astype(jnp.bfloat16)[:, None, :, :, :]
                 .transpose(0, 1, 3, 2, 4)).astype(jnp.float32), axis=3)
  return out.reshape(B, L, D)


def run(fn, name):
  rng = np.random.default_rng(0)
  q = jnp.asarray(rng.normal(size=(B, L, H, DH)), jnp.float32)
  k = jnp.asarray(rng.normal(size=(B, L, H, DH)), jnp.float32)
  v = jnp.asarray(rng.normal(size=(B, L, H, DH)), jnp.float32)
  mask = jnp.asarray(rng.random((B, L)) > 0.3, jnp.float32)
  mask = mask.at[:, 0].set(1.0)

  def loss(q, k, v):
    return jnp.sum(fn(q, k, v, mask) ** 2)

  g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
  try:
    out = g(q, k, v)
    jax.block_until_ready(out)
    for _ in range(3):
      out = g(q, k, v)
    jax.block_until_ready(out)
    _ = float(out[0][0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
      out = g(q, k, v)
    jax.block_until_ready(out)
    _ = float(out[0][0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / STEPS
    print(f'{name:16s}: {dt*1e3:7.2f} ms fwd+bwd')
  except Exception as e:  # noqa: BLE001
    print(f'{name:16s}: FAILED {type(e).__name__}: {str(e)[:160]}')


if __name__ == '__main__':
  for fn, name in [(stock, 'stock'), (head_minor, 'head_minor'),
                   (packed_eye, 'packed_eye'),
                   (packed_concat, 'packed_concat'),
                   (h1_fullwidth, 'h1_control'),
                   (vpu_outer, 'vpu_outer'),
                   (vpu_bf16, 'vpu_bf16'),
                   (bh_major, 'bh_major'),
                   (bf16_stock, 'bf16_stock'),
                   (lane_stack, 'pad64_stock')]:
    run(fn, name)

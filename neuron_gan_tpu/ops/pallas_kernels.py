"""Pallas TPU kernels: fused LeakyReLU + PixelNorm.

Every conv in the PGGAN blocks is followed by LeakyReLU then PixelNorm
(reference models.py:259-268).  XLA usually fuses this elementwise+reduce
chain into the conv epilogue; this hand-fused kernel guarantees a single
HBM read/write for the pair (the op is bandwidth-bound) and carries a
custom VJP so the backward pass is a single fused kernel too.

Layout: the NHWC activation is viewed as (rows, C) with rows = B*H*W; the
grid tiles rows, each block (TILE_R, C) resident in VMEM; the channel
reduction runs on the VPU within the block.  Enabled via config.use_pallas
(off by default — XLA's fusion is already competitive; flip it when the
profiler shows the epilogue unfused).

Forward:  y = lrelu(x); out = y * rsqrt(mean(y^2, C) + eps)
Backward: with r = rsqrt(m + eps), s = sum(g*y, C):
          dy = g*r - y * r^3 * s / C;  dx = dy * (x >= 0 ? 1 : slope)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 512


def _fwd_kernel(x_ref, o_ref, *, neg_slope, eps, n_ch):
    x = x_ref[:]
    y = jnp.where(x >= 0, x, x * neg_slope)
    m = jnp.mean(jnp.square(y), axis=1, keepdims=True)
    o_ref[:] = y * jax.lax.rsqrt(m + eps)


def _bwd_kernel(x_ref, g_ref, dx_ref, *, neg_slope, eps, n_ch):
    x = x_ref[:]
    g = g_ref[:]
    y = jnp.where(x >= 0, x, x * neg_slope)
    m = jnp.mean(jnp.square(y), axis=1, keepdims=True)
    r = jax.lax.rsqrt(m + eps)
    s = jnp.sum(g * y, axis=1, keepdims=True)
    dy = g * r - y * (r * r * r) * (s / n_ch)
    dx_ref[:] = jnp.where(x >= 0, dy, dy * neg_slope)


def _rows_call(kernel, x2d, *more, interpret=False, **kw):
    rows, ch = x2d.shape
    tile = min(_TILE_R, rows)
    grid = (pl.cdiv(rows, tile),)
    specs = [pl.BlockSpec((tile, ch), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
             for _ in range(1 + len(more))]
    return pl.pallas_call(
        functools.partial(kernel, n_ch=ch, **kw),
        out_shape=jax.ShapeDtypeStruct((rows, ch), x2d.dtype),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((tile, ch), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, *more)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def lrelu_pixel_norm_pallas(x, neg_slope=0.2, eps=1e-8, interpret=False):
    """Fused LeakyReLU+PixelNorm on NHWC (channels last)."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _rows_call(_fwd_kernel, x2d, neg_slope=neg_slope, eps=eps,
                     interpret=interpret)
    return out.reshape(shape)


def _fwd_rule(x, neg_slope, eps, interpret):
    return lrelu_pixel_norm_pallas(x, neg_slope, eps, interpret), x


def _bwd_rule(neg_slope, eps, interpret, x, g):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    g2d = g.reshape(-1, shape[-1])
    dx = _rows_call(_bwd_kernel, x2d, g2d, neg_slope=neg_slope, eps=eps,
                    interpret=interpret)
    return (dx.reshape(shape),)


lrelu_pixel_norm_pallas.defvjp(_fwd_rule, _bwd_rule)

"""Pallas TPU kernels: fused LeakyReLU + PixelNorm (plain and grouped).

Every conv in the PGGAN blocks is followed by LeakyReLU then PixelNorm
(reference models.py:259-268).  In the space-to-depth packed layout
(ops/packed.py) the normalization is *grouped*: each of the 4 spatial
parities normalizes its own C original channels.  The einsum (MXU)
formulation of that grouped norm (packed_pixel_norm_mxu) is exact and
fast, but it costs several full HBM passes over the activation per
epilogue: the stats dot_general reads it, the 4->4C broadcast dot_general
materializes a second full-size tensor, and the normalize multiply reads
both (the op trace in BASELINE.md prices the chain at ~14 ms of a 63 ms
step).  This kernel does the whole epilogue — LeakyReLU, per-group
mean-of-squares, rsqrt, normalize — in ONE read and ONE write of the
activation; the backward pass is a single fused kernel too.

Layout: the NHWC activation is viewed as (rows, n_ch) with rows = B*H*W;
the grid tiles rows, each block (TILE_R, n_ch) resident in VMEM; the
per-group channel reductions run on the VPU within the block via static
iota masks (groups are contiguous: packed channel order is parity-major,
so group g owns channels [g*C, (g+1)*C)).  ``n_groups=1`` is the plain
(unpacked) PixelNorm.

Statistics are computed in float32 regardless of input dtype (the
quality-safe half of the ``compute_dtype='mixed'`` recipe; the composed
ops do the same via ``f32_stats``).

Gradients: the kernel carries a custom VJP whose backward is itself a
Pallas kernel, and that backward is *second-order differentiable* — its
own VJP is supplied by autodiff of a pure-JAX mirror — so the WGAN-GP
grad-of-grad (losses.py::d_grad_pen_loss) composes through it.  Third
and higher orders are not defined (the GP needs exactly two).

Forward:  y = lrelu(x); out[g] = y[g] * rsqrt(mean(y[g]^2, C_g) + eps)
Backward: with r = rsqrt(m + eps), s = sum(g*y over the group):
          dy = g*r - y * r^3 * s / C;  dx = dy * (x >= 0 ? 1 : slope)

Enabled for packed blocks via config.pallas_epilogue and for unpacked
blocks via config.use_pallas (both off by default until the hardware
measurement in BASELINE.md justifies flipping the auto gate).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 512


def _group_stats(vals, grp, n_groups, reduce_to_mean, c):
    """Per-group channel sums of ``vals`` (f32, (tile, n_ch)) broadcast back
    over each group's channels.  ``grp`` = (1, n_ch) int group ids."""
    out = jnp.zeros_like(vals)
    for g in range(n_groups):
        mask = grp == g
        s = jnp.sum(jnp.where(mask, vals, 0.0), axis=1, keepdims=True)
        if reduce_to_mean:
            s = s / c
        out = jnp.where(mask, s, out)
    return out


def _grouped_fwd_kernel(x_ref, o_ref, *, neg_slope, eps, n_ch, n_groups):
    # All arithmetic in f32: Mosaic rejects bf16 vector compares, and the
    # >= 0 predicate is exact in either dtype (only the lrelu multiply's
    # rounding differs from the composed bf16 op — ~1 bf16 ulp on negative
    # values, far inside the promoted mixed recipe's noise bar).
    xf = x_ref[:].astype(jnp.float32)
    yf = jnp.where(xf >= 0, xf, xf * neg_slope)
    c = n_ch // n_groups
    grp = jax.lax.broadcasted_iota(jnp.int32, (1, n_ch), 1) // c
    m = _group_stats(yf * yf, grp, n_groups, True, c)
    o_ref[:] = (yf * jax.lax.rsqrt(m + eps)).astype(o_ref.dtype)


def _grouped_bwd_kernel(x_ref, g_ref, dx_ref, *, neg_slope, eps, n_ch,
                        n_groups):
    xf = x_ref[:].astype(jnp.float32)  # f32 arithmetic: see _grouped_fwd_kernel
    yf = jnp.where(xf >= 0, xf, xf * neg_slope)
    gf = g_ref[:].astype(jnp.float32)
    c = n_ch // n_groups
    grp = jax.lax.broadcasted_iota(jnp.int32, (1, n_ch), 1) // c
    m = _group_stats(yf * yf, grp, n_groups, True, c)
    s = _group_stats(gf * yf, grp, n_groups, False, c)
    r = jax.lax.rsqrt(m + eps)
    dy = gf * r - yf * (r * r * r) * (s / c)
    dx_ref[:] = jnp.where(xf >= 0, dy, dy * neg_slope).astype(dx_ref.dtype)


def _grouped_bwd_pure(x2d, g2d, n_groups, neg_slope, eps):
    """Differentiable pure-JAX mirror of _grouped_bwd_kernel; autodiffed to
    supply the backward's own VJP (the GP second-order path)."""
    rows, n_ch = x2d.shape
    c = n_ch // n_groups
    y = jnp.where(x2d >= 0, x2d, x2d * neg_slope)
    yf = y.astype(jnp.float32).reshape(rows, n_groups, c)
    gf = g2d.astype(jnp.float32).reshape(rows, n_groups, c)
    m = jnp.mean(yf * yf, axis=2, keepdims=True)
    s = jnp.sum(gf * yf, axis=2, keepdims=True)
    r = jax.lax.rsqrt(m + eps)
    dy = (gf * r - yf * (r * r * r) * (s / c)).reshape(rows, n_ch)
    return jnp.where(x2d >= 0, dy, dy * neg_slope).astype(x2d.dtype)


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


# --- backward pallas call, wrapped so IT has a VJP (GP grad-of-grad) -------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _bwd_call(x2d, g2d, n_groups, neg_slope, eps, interpret):
    return _rows_call(_grouped_bwd_kernel, x2d, g2d, n_groups=n_groups,
                      neg_slope=neg_slope, eps=eps, interpret=interpret)


def _bwd_call_fwd(x2d, g2d, n_groups, neg_slope, eps, interpret):
    return _bwd_call(x2d, g2d, n_groups, neg_slope, eps, interpret), (x2d, g2d)


def _bwd_call_bwd(n_groups, neg_slope, eps, interpret, res, ct):
    x2d, g2d = res
    _, vjp = jax.vjp(
        lambda a, b: _grouped_bwd_pure(a, b, n_groups, neg_slope, eps),
        x2d, g2d)
    return vjp(ct)


_bwd_call.defvjp(_bwd_call_fwd, _bwd_call_bwd)


# --- public fused epilogue ---------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def grouped_lrelu_pixel_norm_pallas(x, n_groups=1, neg_slope=0.2, eps=1e-8,
                                    interpret=False):
    """Fused LeakyReLU + grouped PixelNorm on NHWC (channels last).

    ``n_groups=1`` = plain PixelNorm over all channels; ``n_groups=4`` =
    the packed-parity grouped norm (packed_pixel_norm semantics).  Stats
    in float32; output in ``x.dtype``.  First- and second-order
    differentiable (see module docstring)."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _rows_call(_grouped_fwd_kernel, x2d, n_groups=n_groups,
                     neg_slope=neg_slope, eps=eps, interpret=interpret)
    return out.reshape(shape)


def _fwd_rule(x, n_groups, neg_slope, eps, interpret):
    return grouped_lrelu_pixel_norm_pallas(
        x, n_groups, neg_slope, eps, interpret), x


def _bwd_rule(n_groups, neg_slope, eps, interpret, x, g):
    shape = x.shape
    dx = _bwd_call(x.reshape(-1, shape[-1]), g.reshape(-1, shape[-1]),
                   n_groups, neg_slope, eps, interpret)
    return (dx.reshape(shape),)


grouped_lrelu_pixel_norm_pallas.defvjp(_fwd_rule, _bwd_rule)


def lrelu_pixel_norm_pallas(x, neg_slope=0.2, eps=1e-8, interpret=False):
    """Fused LeakyReLU + PixelNorm on NHWC (channels last)."""
    return grouped_lrelu_pixel_norm_pallas(x, 1, neg_slope, eps, interpret)


def packed_lrelu_pixel_norm_pallas(x_packed, neg_slope=0.2, eps=1e-8,
                                   interpret=False):
    """Fused LeakyReLU + parity-grouped PixelNorm for the packed layout
    ((..., 4C) channels, parity-major — ops/packed.py)."""
    return grouped_lrelu_pixel_norm_pallas(x_packed, 4, neg_slope, eps,
                                           interpret)

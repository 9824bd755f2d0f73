"""Fused packed conv3x3 + LeakyReLU + grouped PixelNorm Pallas kernel.

The packed PGGAN block body (reference models.py:259-268; packed layout
ops/packed.py) is conv3x3 -> LeakyReLU -> parity-grouped PixelNorm.  The
round-2 epilogue-only Pallas kernel (ops/pallas_kernels.py) LOST end to end
because the opaque kernel call stopped XLA from fusing the epilogue into
the conv — the fix named there is fusing the conv INTO the kernel, which
this module does:

forward (one kernel):
  read an x row-tile once (with 1-row halos), run the 9-tap packed conv as
  MXU dot products with f32 accumulation, apply LeakyReLU and the 4-group
  PixelNorm on the VPU, and write TWO outputs:
    y (B, H, W, N)   the block output, in x.dtype
    r (B, H*W, 4)    the per-parity-group rsqrt scale, f32 (1/32 the bytes
                     of a bf16 y at N=64) — saved so the backward never
                     rematerializes the pre-activation z.  The (rows, 4)
                     layout is the shape the kernel's group-sum dot
                     produces; storing it unreshaped keeps Mosaic off the
                     lane-crossing (rows,4)->(tr,4W) shape cast it cannot
                     lower.
  vs the composed ops this removes the z materialization entirely: XLA's
  training graph writes z (conv out) and re-reads it for the epilogue and
  for the backward residual; here z lives only in VMEM.

backward:
  z is reconstructed IN-KERNEL from (y, r): u = lrelu(z) = y / s with
  s = broadcast(r) > 0, and z = u / lrelu'(sign(u)).  One fused kernel
  computes dz from (y, r, g) in a single pass; dx/dw then come from the
  XLA conv's own VJP (jax.vjp of lax.conv_general_dilated), which is
  exactly the adjoint pair XLA would have built for the composed conv.

second order:
  the WGAN-GP grad-of-grad (losses.py::d_grad_pen_loss) differentiates the
  backward.  The dz kernel carries its own VJP from a pure-JAX mirror
  (elementwise + two tiny 0/1 matmuls — no convs), and the dx/dw conv VJP
  is ordinary differentiable XLA, so the GP composes.  Third order is not
  defined (the GP needs exactly two).

Numerics: conv accumulates in f32 on the MXU (preferred_element_type) from
x.dtype operands — identical operand/accumulation classes as the composed
mixed path (bf16 pass, f32 accumulation); PixelNorm statistics are f32.
Output rounds once to x.dtype (the composed path rounds z once too, so the
deviation class is <= 2 ulp reassociation noise — same bar as the landed
MXU epilogues, BASELINE.md).  The 'highest' / float32 parity path never
routes here (models/pggan.py gates on the mixed fast path).

Enabled via config.pallas_conv (default 'auto' resolves per BASELINE.md
measurement; see PGConfig.packed_pallas_conv).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _row_tile(h, w, k, n):
    """Rows per grid step, sized to the ~16 MB scoped-VMEM stack.

    Residency per row: the x tile + its padded concat copy (2 bf16 copies
    of width*k), ~6 f32 row-major temporaries of width*n live at once in
    the body (acc, u, u*u, s, the y product, plus a tap operand), the y
    output block (x.dtype) and the (rows, 4) f32 r block — all double
    buffered by Mosaic.  Target 6 MB of single-buffer residency so the
    2x buffering lands well under the 16 MB limit (measured: the old
    optimistic count OOMed at 17.8 MB on v5e at 128^2)."""
    bytes_per_row = w * (2 * 2 * k + 6 * 4 * n + 2 * n + 4 * 4)
    tr = max(8, int(6e6) // max(1, bytes_per_row))
    tr = min(tr, h)
    while h % tr:
        tr -= 1
    return tr


def _group_matrix(n, groups=4):
    """(N, groups) 0/1 f32: column g marks parity group g's channels
    (packed channel order is parity-major — ops/packed.py)."""
    c = n // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (n, groups), 0) // c
    gid = jax.lax.broadcasted_iota(jnp.int32, (n, groups), 1)
    return (ch == gid).astype(jnp.float32)


def _fwd_kernel(x_ref, top_ref, bot_ref, w_ref, y_ref, r_ref, *,
                tr, width, n_out, neg_slope, eps):
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    xt = x_ref[0]                                       # (tr, W, K)
    top = jnp.where(i == 0, 0.0, top_ref[0, 0]).astype(xt.dtype)
    bot = jnp.where(i == last, 0.0, bot_ref[0, 0]).astype(xt.dtype)
    xfull = jnp.concatenate([top[None], xt, bot[None]], axis=0)
    zcol = jnp.zeros((tr + 2, 1, xfull.shape[-1]), xfull.dtype)
    xp = jnp.concatenate([zcol, xfull, zcol], axis=1)   # (tr+2, W+2, K)

    rows = tr * width
    acc = jnp.zeros((rows, n_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xp[dy:dy + tr, dx:dx + width].reshape(rows, -1)
            acc = acc + jnp.dot(tap, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)

    u = jnp.where(acc >= 0, acc, acc * neg_slope)       # lrelu, f32
    gmat = _group_matrix(n_out)
    c = n_out // 4
    m4 = jnp.dot(u * u, gmat, preferred_element_type=jnp.float32) / c
    r4 = jax.lax.rsqrt(m4 + eps)                        # (rows, 4) f32
    s = jnp.dot(r4, gmat.T, preferred_element_type=jnp.float32)
    y_ref[0] = (u * s).reshape(tr, width, n_out).astype(y_ref.dtype)
    r_ref[0] = r4


def _dz_kernel(y_ref, r_ref, g_ref, ctr_ref, dz_ref, *, width, n_out,
               neg_slope, eps):
    """dz from (y, r, cotangent g, r-cotangent ct_r) in one pass.

    u = y / s (s = broadcast r > 0); z sign == u sign; with
    t_g = sum(g*u over group g) + ct_r_g  (the r cotangent enters the same
    place as the norm's own sum term — both differentiate rsqrt(m+eps)):
    du = g*s - u * s^3 * t/C;  dz = du * lrelu'(z)."""
    tr = y_ref.shape[1]
    rows = tr * width
    gmat = _group_matrix(n_out)
    c = n_out // 4
    yf = y_ref[0].reshape(rows, n_out).astype(jnp.float32)
    gf = g_ref[0].reshape(rows, n_out).astype(jnp.float32)
    r4 = r_ref[0]
    ctr4 = ctr_ref[0]
    s = jnp.dot(r4, gmat.T, preferred_element_type=jnp.float32)
    u = yf / s
    t4 = jnp.dot(gf * u, gmat, preferred_element_type=jnp.float32) + ctr4
    t = jnp.dot(t4, gmat.T, preferred_element_type=jnp.float32)
    du = gf * s - u * (s * s * s) * (t / c)
    dz = jnp.where(u >= 0, du, du * neg_slope)
    dz_ref[0] = dz.reshape(tr, width, n_out).astype(dz_ref.dtype)


def _dz_pure(y, r, g, ct_r, neg_slope):
    """Differentiable pure-JAX mirror of _dz_kernel (NHWC y/g, (B,H*W,4)
    r/ct_r); autodiffed to give the dz kernel its own VJP — the GP second
    order (which needs exactly this one extra derivative)."""
    b, h, w, n = y.shape
    c = n // 4
    yf = y.astype(jnp.float32).reshape(b, h, w, 4, c)
    gf = g.astype(jnp.float32).reshape(b, h, w, 4, c)
    r4 = r.reshape(b, h, w, 4, 1)
    ctr4 = ct_r.reshape(b, h, w, 4, 1)
    u = yf / r4
    t = jnp.sum(gf * u, axis=-1, keepdims=True) + ctr4
    du = gf * r4 - u * (r4 ** 3) * (t / c)
    dz = jnp.where(u >= 0, du, du * neg_slope)
    return dz.reshape(b, h, w, n).astype(y.dtype)


def _call_fwd(x, w_packed, neg_slope, eps, interpret):
    b, h, width, k = x.shape
    n = w_packed.shape[-1]
    tr = _row_tile(h, width, k, n)
    grid = (b, h // tr)
    kern = functools.partial(_fwd_kernel, tr=tr, width=width, n_out=n,
                             neg_slope=neg_slope, eps=eps)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, width, k), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # 1-row halos; clamped at the edges, masked in-kernel
            pl.BlockSpec((1, 1, width, k),
                         lambda b_, i: (b_, jnp.maximum(i * tr - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, width, k),
                         lambda b_, i: (b_, jnp.minimum(i * tr + tr, h - 1),
                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # whole packed kernel
        ],
        out_specs=(
            pl.BlockSpec((1, tr, width, n), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr * width, 4), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, width, n), x.dtype),
            jax.ShapeDtypeStruct((b, h * width, 4), jnp.float32),
        ),
        interpret=interpret,
    )(x, x, x, w_packed.astype(x.dtype))


# ---- dz kernel wrapped with its own VJP (GP grad-of-grad) ------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _dz_call(y, r, g, ct_r, neg_slope, eps, interpret):
    b, h, width, n = y.shape
    tr = _row_tile(h, width, n, n)
    grid = (b, h // tr)
    kern = functools.partial(_dz_kernel, width=width, n_out=n,
                             neg_slope=neg_slope, eps=eps)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, width, n), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr * width, 4), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, width, n), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr * width, 4), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, width, n), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, width, n), y.dtype),
        interpret=interpret,
    )(y, r, g, ct_r)


def _dz_call_fwd(y, r, g, ct_r, neg_slope, eps, interpret):
    return (_dz_call(y, r, g, ct_r, neg_slope, eps, interpret),
            (y, r, g, ct_r))


def _dz_call_bwd(neg_slope, eps, interpret, res, ct):
    y, r, g, ct_r = res
    _, vjp = jax.vjp(
        lambda a, b_, c, d: _dz_pure(a, b_, c, d, neg_slope), y, r, g, ct_r)
    return vjp(ct)


_dz_call.defvjp(_dz_call_fwd, _dz_call_bwd)


# ---- public fused op -------------------------------------------------------

def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_pair(x, w_packed, neg_slope, eps, interpret):
    """(y, r) with the custom VJP attached (both outputs' cotangents are
    handled — ct_r is live under the GP grad-of-grad)."""
    return _call_fwd(x, w_packed, neg_slope, eps, interpret)


def _fused_fwd(x, w_packed, neg_slope, eps, interpret):
    # Call the WRAPPED op, not _call_fwd: the fwd rule's trace must contain
    # only custom_vjp-guarded pallas calls, or the outer linearization of a
    # grad-of-grad (the WGAN-GP) would try to JVP a naked pallas kernel.
    y, r = _fused_pair(x, w_packed, neg_slope, eps, interpret)
    return (y, r), (x, w_packed, y, r)


def _fused_bwd(neg_slope, eps, interpret, res, cts):
    x, w_packed, y, r = res
    ct_y, ct_r = cts  # ct_r is LIVE under grad-of-grad: the backward itself
    # consumes r, so the outer differentiation sends a cotangent into it
    dz = _dz_call(y, r, ct_y, ct_r, neg_slope, eps, interpret)
    # dx/dw: the XLA conv's own adjoints (what the composed graph would use)
    _, conv_vjp = jax.vjp(_conv, x, w_packed.astype(x.dtype))
    dx, dw = conv_vjp(dz.astype(x.dtype))
    return dx, dw.astype(w_packed.dtype)


_fused_pair.defvjp(_fused_fwd, _fused_bwd)


def packed_conv3x3_lrelu_pn_pallas(x, w_packed, neg_slope=0.2, eps=1e-8,
                                   interpret=False):
    """Fused packed conv3x3 + LeakyReLU + 4-group PixelNorm (module doc).

    ``w_packed`` is the packed-domain (3, 3, 4Ci, 4Co) kernel with the
    equalized-LR scale already folded in (ops/packed.py::pack_conv3x3_weight).
    Output in x.dtype; first- and second-order differentiable (the GP needs
    exactly two; higher orders are undefined).
    """
    y, _ = _fused_pair(x, w_packed, neg_slope, eps, interpret)
    return y

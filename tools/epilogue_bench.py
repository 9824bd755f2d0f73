#!/usr/bin/env python
"""Microbenchmark: packed8 LeakyReLU+grouped-PixelNorm epilogue formulations.

The round-4 op trace (BASELINE.md) shows the grouped-stat einsum family
(`bhwk,kg->bhwg` + its `bhwg,kg->bhwk` broadcast-back, fwd+bwd+GP pieces)
at ~8.1 of 36.2 ms/step — the #2 category after the convs.  The stats are
per-PIXEL over 8 contiguous 16-lane groups (a lane-local reduction), so
several one-or-two-pass formulations exist; this tool times them inside
the realistic block chain (conv3x3 -> epilogue -> conv3x3 -> epilogue) at
the 512^2 top-phase packed8 geometry, forward, forward+backward, and
GP-style second order (grad of the input-gradient's norm — the
double-backward shape losses.py::d_grad_pen_loss drives).

Formulations (all = lrelu + grouped pixelnorm, f32 stats, bf16 in/out):
  einsum    : shipping packed8_pixel_norm_mxu (stats dot + broadcast dot)
  pallas8   : ops/pallas_kernels.py grouped kernel, n_groups=8 (one read,
              one write; the round-2 4-group/64-lane measurement lost —
              VERDICT r4 asks for the 8-group/128-lane revisit)
  reshape   : grouped-(…,8,C)-view reduce (the pre-MXU formulation)
  selectb   : stats dot + broadcast-back as 8 fusable where-selects on a
              lane-iota mask (no second dot_general; the scale tensor is
              never materialized unless XLA declines to fuse)
  takeb     : stats dot + jnp.take lane-gather broadcast
  conv1x1   : both stats and broadcast as 1x1 convs (conv emitter instead
              of the dot emitter for the same 0/1 contraction)

    python tools/epilogue_bench.py [--iters 20] [--second-order]
"""
import argparse
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from neuron_gan_tpu.ops import packed as pk  # noqa: E402
from neuron_gan_tpu.ops.pallas_kernels import (  # noqa: E402
    grouped_lrelu_pixel_norm_pallas)

EPS = 1e-8
SLOPE = 0.2


def _lrelu(y):
    return jnp.where(y > 0, y, SLOPE * y)


def epi_einsum(y):
    return pk.packed8_pixel_norm_mxu(_lrelu(y), EPS, f32_stats=True)


def epi_pallas8(y):
    return grouped_lrelu_pixel_norm_pallas(y, 8, SLOPE, EPS)


def epi_reshape(y):
    return pk.packed8_pixel_norm(_lrelu(y), EPS, f32_stats=True)


def _stats_r(y, c8, g):
    gb = jnp.asarray(pk._group_mat(c8, g), jnp.bfloat16)
    m = jnp.einsum('bhwk,kg->bhwg', jnp.square(y), gb,
                   preferred_element_type=jnp.float32) * (g / c8)
    return lax.rsqrt(m + EPS).astype(jnp.bfloat16)


def epi_selectb(y):
    y = _lrelu(y)
    c8, g = y.shape[-1], 8
    c = c8 // g
    r = _stats_r(y, c8, g)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, 1, c8), 3) // c
    scale = jnp.zeros_like(y)
    for gi in range(g):
        scale = jnp.where(lane == gi, r[..., gi:gi + 1], scale)
    return y * scale


def epi_takeb(y):
    y = _lrelu(y)
    c8, g = y.shape[-1], 8
    c = c8 // g
    r = _stats_r(y, c8, g)
    idx = jnp.asarray(np.arange(c8) // c)
    return y * jnp.take(r, idx, axis=-1)


def epi_conv1x1(y):
    y = _lrelu(y)
    c8, g = y.shape[-1], 8
    gb = jnp.asarray(pk._group_mat(c8, g), jnp.bfloat16)
    m = lax.conv_general_dilated(
        jnp.square(y), gb.reshape(1, 1, c8, g), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32) * (g / c8)
    r = lax.rsqrt(m + EPS).astype(jnp.bfloat16)
    return y * lax.conv_general_dilated(
        r, gb.T.reshape(1, 1, g, c8), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.bfloat16)


def epi_bigdot(y):
    """ONE full-lane dot: (y^2) @ G with G = (128,128) 0/1 same-group
    matrix yields the group sums already broadcast to every channel of the
    group, so the broadcast-back einsum disappears and the rsqrt+multiply
    are pure elementwise consumers of the dot output (fusable into its
    epilogue — the stats tensor need never hit HBM).  16x the MACs of the
    (128,8) stats dot, but that dot was MXU-underutilized (8 of 128 output
    lanes); per-output-element accumulation order is identical, so values
    are bit-equal to the shipping pair."""
    y = _lrelu(y)
    c8, g = y.shape[-1], 8
    c = c8 // g
    gm = pk._group_mat(c8, g)
    G = jnp.asarray(gm @ gm.T, jnp.bfloat16)  # 0/1: exact in bf16
    m = jnp.einsum('bhwk,kj->bhwj', jnp.square(y), G,
                   preferred_element_type=jnp.float32) * (1.0 / c)
    return y * lax.rsqrt(m + EPS).astype(jnp.bfloat16)


@jax.custom_vjp
def _bigdot_bf16ct(y):
    return epi_bigdot(y)


def _bigdot_bf16ct_fwd(y):
    return epi_bigdot(y), y


def _bigdot_bf16ct_bwd(y, ct):
    # the probe: autodiff backward of the same-group-dot epilogue, but
    # with the full-size f32 intermediates of the cotangent path staged
    # to bf16 before the backward dot (halves its operand bytes; rounds
    # the stats cotangent ~2^-8 — would need a 6-seed gate to ship)
    c8, g = y.shape[-1], 8
    c = c8 // g
    gm = pk._group_mat(c8, g)
    G = jnp.asarray(gm @ gm.T, jnp.bfloat16)
    yl = _lrelu(y)
    m = jnp.einsum('bhwk,kj->bhwj', jnp.square(yl), G,
                   preferred_element_type=jnp.float32) * (1.0 / c)
    r3 = lax.rsqrt(m + EPS)
    r = r3.astype(jnp.bfloat16)
    r3 = (r3 * r3 * r3).astype(jnp.bfloat16)
    # d out/d yl = r - yl * r^3 * (1/c) * sum_group(ct*yl)... via bf16 dot
    t = (ct * yl).astype(jnp.bfloat16)
    s = jnp.einsum('bhwk,kj->bhwj', t, G,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    dyl = ct * r - yl * r3 * s * (1.0 / c)
    return (jnp.where(y > 0, dyl, 0.2 * dyl),)


_bigdot_bf16ct.defvjp(_bigdot_bf16ct_fwd, _bigdot_bf16ct_bwd)


FORMS = {'einsum': epi_einsum, 'pallas8': epi_pallas8,
         'reshape': epi_reshape, 'selectb': epi_selectb,
         'takeb': epi_takeb, 'bigdot': epi_bigdot,
         # first-order probe only (no VJP-of-VJP): skip --second-order
         'bigdot_bf16ct': _bigdot_bf16ct,
         # conv1x1 is forward-only: the bf16-operand/f32-preferred conv's
         # transpose rule rejects the mixed cotangent dtype
         'conv1x1': epi_conv1x1}


def make_chain(epi):
    def chain(x8, p1, p2):
        y = pk.packed8_equalized_conv3x3(x8, p1)
        y = epi(y)
        y = pk.packed8_equalized_conv3x3(y, p2)
        return epi(y)
    return chain


def _time(run, args, iters):
    np.asarray(run(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--second-order', action='store_true')
    ap.add_argument('--forms', nargs='*', default=list(FORMS))
    args = ap.parse_args()

    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()

    key = jax.random.PRNGKey(0)
    c = 16
    x = jax.random.normal(key, (8, 512, 512, c), jnp.bfloat16)
    x8 = pk.space_to_depth_w(pk.space_to_depth(x))
    p1 = {'w': jax.random.normal(key, (3, 3, c, c)) * 0.2}
    p2 = {'w': jax.random.normal(key, (3, 3, c, c)) * 0.2}

    # numerical sanity vs the shipping form (same math, reorder-level diff)
    ref = make_chain(epi_einsum)(x8, p1, p2)
    for name in args.forms:
        out = make_chain(FORMS[name])(x8, p1, p2)
        dev = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f'max|{name} - einsum| = {dev:.2e}')

    iters = args.iters
    for name in args.forms:
        chain = make_chain(FORMS[name])

        run_f = jax.jit(lambda x_, a, b: lax.scan(
            lambda y, _: (chain(y, a, b), ()), x_, None,
            length=iters)[0].astype(jnp.float32).mean())
        tf = _time(run_f, (x8, p1, p2), iters)

        def loss(x_, a, b):
            return chain(x_, a, b).astype(jnp.float32).mean()
        g = jax.grad(loss, argnums=(0, 1, 2))

        def body(y, _, a, b):
            dy, d1, d2 = g(y, a, b)
            return y + dy.astype(y.dtype) * 0, (d1['w'].mean(),)
        run_g = jax.jit(lambda x_, a, b: lax.scan(
            partial(body, a=a, b=b), x_, None, length=iters)[1][0].sum())
        tg = _time(run_g, (x8, p1, p2), iters)

        t2 = float('nan')
        if args.second_order:
            # GP shape: grad wrt params of ||d chain / d x||-style scalar
            def gp(x_, a, b):
                dx = jax.grad(loss)(x_, a, b).astype(jnp.float32)
                return (jnp.sqrt(jnp.sum(dx * dx) + 1e-12) - 1.0) ** 2
            g2 = jax.grad(gp, argnums=(1, 2))

            def body2(y, _, a, b):
                d1, d2 = g2(y, a, b)
                return y, (d1['w'].mean(),)
            run_2 = jax.jit(lambda x_, a, b: lax.scan(
                partial(body2, a=a, b=b), x_, None, length=iters)[1][0].sum())
            t2 = _time(run_2, (x8, p1, p2), iters)

        print(f'{name:8s} fwd {tf * 1e3:7.3f}  fwd+bwd {tg * 1e3:7.3f}  '
              f'2nd-order {t2 * 1e3:7.3f}  ms/2-stage-block', flush=True)


if __name__ == '__main__':
    main()

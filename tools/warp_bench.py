#!/usr/bin/env python
"""Microbenchmark exact formulations of the augmentation warp gather.

The affine warp (data/augment.py::_affine_warp_nearest) is an exact 2D
nearest gather — BASELINE.md measured it at ~15-24% of the packed train
step.  Rotation entangles rows and columns, so no exact separable (shear /
two-pass) decomposition exists; the lever is how the single gather is
expressed to XLA.  This tool times candidate formulations that are all
bit-exact by construction and prints one JSON line each.

    python tools/warp_bench.py [--res 768] [--batch 8] [--iters 20]
"""

import argparse
import functools
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp


def coords(p, angle_deg, tx, ty, flip):
    c_half = (p - 1) / 2.0
    ys = jnp.arange(p, dtype=jnp.float32)
    xs = jnp.arange(p, dtype=jnp.float32)
    ys_eff = jnp.where(flip, (p - 1) - ys, ys)
    uy = ys_eff - c_half
    ux = xs - c_half
    rad = angle_deg * (math.pi / 180.0)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    ux_t = ux - tx
    uy_t = uy - ty
    qx = cos * ux_t[None, :] + sin * uy_t[:, None] + c_half
    qy = -sin * ux_t[None, :] + cos * uy_t[:, None] + c_half
    ix = jnp.round(qx).astype(jnp.int32)
    iy = jnp.round(qy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < p) & (iy >= 0) & (iy < p)
    return jnp.clip(iy, 0, p - 1), jnp.clip(ix, 0, p - 1), valid


def warp_flat_take(img, iy, ix, valid):
    """Round-1 shipping version: flattened 1D take."""
    p = img.shape[0]
    flat = img.reshape(p * p, img.shape[-1]).at[
        (iy * p + ix).reshape(-1)].get(mode='promise_in_bounds')
    out = flat.reshape(p, p, img.shape[-1])
    return jnp.where(valid[..., None], out, 0.0)


def warp_advanced_index(img, iy, ix, valid):
    out = img[iy, ix]
    return jnp.where(valid[..., None], out, 0.0)


def warp_gather_op(img, iy, ix, valid):
    """jax.lax.gather with explicit dimension numbers (point gather)."""
    p = img.shape[0]
    idx = jnp.stack([iy, ix], axis=-1).reshape(-1, 2)
    g = jax.lax.gather(
        img, idx,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1)),
        slice_sizes=(1, 1, img.shape[-1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    out = g.reshape(p, p, img.shape[-1])
    return jnp.where(valid[..., None], out, 0.0)


def warp_int_flat(img, iy, ix, valid):
    """Flat take with the index arithmetic fused and mask folded via a
    sentinel row (avoids the separate where pass): index invalid pixels to
    a zero row appended to the source."""
    p = img.shape[0]
    c = img.shape[-1]
    flat = jnp.concatenate([img.reshape(p * p, c),
                            jnp.zeros((1, c), img.dtype)], axis=0)
    lin = jnp.where(valid, iy * p + ix, p * p)
    return flat.at[lin.reshape(-1)].get(
        mode='promise_in_bounds').reshape(p, p, c)


VARIANTS = {
    'flat_take (current)': warp_flat_take,
    'advanced_index': warp_advanced_index,
    'gather_op': warp_gather_op,
    'int_flat_sentinel': warp_int_flat,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=768)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()

    p = args.res
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((args.batch, p, p, 1)).astype(np.float32))

    def batched(fn):
        def one(img, k):
            ka, kt, kf = jax.random.split(k, 3)
            ang = jax.random.uniform(ka, (), minval=-180.0, maxval=180.0)
            t = jnp.round(jax.random.uniform(kt, (2,), minval=-38.0,
                                             maxval=38.0))
            flip = jax.random.bernoulli(kf)
            iy, ix, valid = coords(p, ang, t[0], t[1], flip)
            return fn(img, iy, ix, valid)

        @jax.jit
        def run_once(imgs, key):
            return jax.vmap(one)(imgs, jax.random.split(key, imgs.shape[0]))

        # scan many iterations inside ONE dispatch: the 5-10 s axon relay
        # per-call overhead would otherwise swamp a ~10 ms kernel
        @jax.jit
        def run_scan(imgs, key):
            def body(acc, i):
                out = jax.vmap(one)(imgs,
                                    jax.random.split(jax.random.fold_in(key, i),
                                                     imgs.shape[0]))
                return acc + jnp.mean(out), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), imgs.dtype),
                                  jnp.arange(args.iters))
            return acc
        return run_once, run_scan

    ref_out = None
    for name, fn in VARIANTS.items():
        run_once, run_scan = batched(fn)
        out = np.asarray(run_once(imgs, jax.random.PRNGKey(0)))
        if ref_out is None:
            ref_out = out
        else:
            assert np.array_equal(out, ref_out), f'{name} NOT bit-exact'
        np.asarray(run_scan(imgs, jax.random.PRNGKey(1)))  # compile
        t0 = time.perf_counter()
        np.asarray(run_scan(imgs, jax.random.PRNGKey(2)))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({'variant': name, 'ms_per_batch': round(dt * 1e3, 2),
                          'bit_exact': True}), flush=True)


if __name__ == '__main__':
    main()

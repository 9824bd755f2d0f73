#!/usr/bin/env python
"""Decomposition timing of the production 512^2 WGAN-GP train step.

Times each stage of the step (augmentation, critic update with/without the
gradient penalty, generator update) as its own scanned jitted call so
per-dispatch relay overhead is amortized identically, and prints one JSON
line per stage.  This is the measurement that directs kernel work: it says
where the 114 ms/step actually goes.

    python tools/step_profile.py [--reps 20] [--phase 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--phase', type=int, default=5)
    ap.add_argument('--compute_dtype', type=str, default='float32')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()
    from neuron_gan_tpu.data.augment import AugmentSpec, augment_batch
    from neuron_gan_tpu.losses import d_w_loss, d_grad_pen_loss, g_w_loss
    from neuron_gan_tpu.models import (init_generator_pg,
                                       init_discriminator_pg, generator_pg,
                                       discriminator_pg)
    from neuron_gan_tpu.train_step import make_optimizer
    from neuron_gan_tpu.utils.latents import sample_latent_vec
    from neuron_gan_tpu.flagship import flagship_config

    cfg = flagship_config(compute_dtype=args.compute_dtype)
    phase = args.phase
    res = cfg.resolution(phase)
    crop = cfg.resolution(cfg.n_phases - 1)   # dataset max (512)
    pad = crop + crop // 2                    # production padded stack (768)
    B = 8

    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g_params = init_generator_pg(kg, cfg)
    d_params = init_discriminator_pg(kd, cfg)
    opt = make_optimizer()
    g_opt = opt.init(g_params)
    d_opt = opt.init(d_params)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((B, pad, pad, 1)).astype(np.float32))
    imgs = jnp.asarray(rng.random((B, res, res, 1)).astype(np.float32) * 2 - 1)

    # the production augmentation: crop window = dataset max, resize to
    # phase scale, fused fast path + shear warp (the shipping defaults —
    # neuron_gan_tpu/flagship.py)
    aug_spec = AugmentSpec(crop_size=crop, out_size=res, translation=0.05,
                           augment=True, fast=True, shear=True)

    def g_apply(p, z):
        return generator_pg(p, z, cfg, phase)

    def d_apply(p, x):
        return discriminator_pg(p, x, cfg, phase)

    def timed(name, fn, *fn_args):
        """fn is scanned args.reps times inside one jit; reports ms/rep.

        The jitted call reduces its carry to ONE scalar on device — fetching
        a full parameter pytree would cost one relay round trip per leaf and
        swamp the measurement."""
        @jax.jit
        def run(*a):
            def body(c, k):
                return fn(c, k, *a[1:]), ()
            c, _ = jax.lax.scan(body, a[0], jax.random.split(
                jax.random.PRNGKey(1), args.reps))
            leaves = [jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(c)]
            return jnp.sum(jnp.stack(leaves))
        np.asarray(run(*fn_args))  # compile + sync
        t0 = time.perf_counter()
        np.asarray(run(*fn_args))
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({'stage': name, 'ms': round(dt * 1e3, 2)}), flush=True)
        return dt

    # 1. augmentation (sum reduces the output so it can't be dead-code'd)
    timed('augment_fast',
          lambda c, k: c + jnp.sum(augment_batch(raw, k, aug_spec)),
          jnp.zeros(()))

    # 2. D forward only (key-perturbed input so the scan can't hoist the
    # loop-invariant forward out of the loop)
    timed('d_forward',
          lambda c, k: c + jnp.sum(d_apply(
              d_params, imgs + jax.random.uniform(k, ()) * 1e-6)),
          jnp.zeros(()))

    # 3. G forward only
    timed('g_forward',
          lambda c, k: c + jnp.sum(
              g_apply(g_params, sample_latent_vec(k, (B, cfg.latent_dim)))),
          jnp.zeros(()))

    # 4. critic update WITHOUT gradient penalty
    def critic_step(state, k, with_gp):
        d_p, d_o = state
        z1 = sample_latent_vec(jax.random.fold_in(k, 0), (B, cfg.latent_dim))
        z2 = sample_latent_vec(jax.random.fold_in(k, 1), (B, cfg.latent_dim))
        eps = jax.random.uniform(jax.random.fold_in(k, 2), (B,))

        def loss(d_p_):
            lw, _ = d_w_loss(d_apply, g_apply, d_p_, g_params, imgs, z1, 1e-3)
            if with_gp:
                fake = jax.lax.stop_gradient(g_apply(g_params, z2))
                lw = lw + d_grad_pen_loss(d_apply, d_p_, imgs, fake, eps, 10.0)
            return lw

        grads = jax.grad(loss)(d_p)
        upd, d_o = opt.update(grads, d_o, d_p)
        import optax
        return (optax.apply_updates(d_p, upd), d_o)

    timed('critic_update_no_gp',
          lambda c, k: critic_step(c, k, False), (d_params, d_opt))
    timed('critic_update_with_gp',
          lambda c, k: critic_step(c, k, True), (d_params, d_opt))

    # 5. generator update
    def gen_step(state, k):
        g_p, g_o = state
        zg = sample_latent_vec(k, (B, cfg.latent_dim))

        def loss(g_p_):
            l, _ = g_w_loss(g_apply, d_apply, g_p_, d_params, zg)
            return l

        grads = jax.grad(loss)(g_p)
        upd, g_o = opt.update(grads, g_o, g_p)
        import optax
        return (optax.apply_updates(g_p, upd), g_o)

    timed('gen_update', gen_step, (g_params, g_opt))


if __name__ == '__main__':
    main()

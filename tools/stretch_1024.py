#!/usr/bin/env python
"""Stretch validation (BASELINE.json config 5): 1024x1024 training with an
EMA shadow generator on real TPU hardware.

Runs a short chunk of WGAN-GP training at the 1024^2 top phase of a
7-layer PGGAN (image_size_init 16, 6 upsamples) with ema_beta > 0, reports
steps/sec, saves a native checkpoint containing g_ema, and renders the
-ema eval grid through the standard eval path.

    python tools/stretch_1024.py [--epochs 6] [--out /tmp/stretch1024]
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
    ap.add_argument('--epochs', type=int, default=6)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--ema_beta', type=float, default=0.999)
    ap.add_argument('--out', type=str, default='/tmp/stretch1024')
    args = ap.parse_args()

    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from neuron_gan_tpu.checkpoint import save_pytree_npz, load_pytree_npz
    from neuron_gan_tpu.models import (
        GrowthState, init_generator_pg, init_discriminator_pg,
        generator_pg)
    from neuron_gan_tpu.train_step import (
        make_epoch_runner, make_optimizer, init_train_state)
    from neuron_gan_tpu.utils.plotting import plot_gen_samples

    from neuron_gan_tpu.flagship import flagship_config, flagship_chunk_spec
    os.makedirs(args.out, exist_ok=True)
    # flagship execution defaults, one growth layer deeper (16 -> 1024)
    cfg = flagship_config(
        n_gen_features=(128, 64, 32, 32, 16, 16, 8),
        n_dis_features=(8, 16, 16, 32, 32, 64, 128))
    top = cfg.n_phases - 1
    res = cfg.resolution(top)
    assert res == 1024, res

    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    opt = make_optimizer(0.5, False)
    state = init_train_state(init_generator_pg(kg, cfg),
                             init_discriminator_pg(kd, cfg), opt,
                             ema_beta=args.ema_beta)

    n_images = args.batch * 2
    # padded stack like the real pipeline: 1024 + 2*256
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((n_images, 1536, 1536, 1))
                         .astype(np.float32))

    spec = flagship_chunk_spec(
        top, batch_size=args.batch, n_images=n_images, crop_size=1024,
        lr_gamma=0.9998, lr_cap=1000, ema_beta=args.ema_beta)

    runner = make_epoch_runner(cfg, spec, args.epochs, donate=False)
    print('compiling 1024^2 train step...', flush=True)
    state2, stats = runner(state, images, jax.random.PRNGKey(1), 1)
    np.asarray(stats)
    t0 = time.perf_counter()
    state2, stats = runner(state, images, jax.random.PRNGKey(2), 1)
    stats = np.asarray(stats)
    dt = time.perf_counter() - t0
    assert np.isfinite(stats).all()
    steps = args.epochs * (n_images // args.batch)
    sps = steps / dt

    # EMA sanity: shadow moved but less than the raw params
    g_new = jax.tree.leaves(state2['g_params'])
    g_ema = jax.tree.leaves(state2['g_ema'])
    g_old = jax.tree.leaves(state['g_params'])
    d_raw = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_new, g_old))
    d_ema = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_ema, g_old))
    assert 0 < d_ema < d_raw, (d_ema, d_raw)

    # checkpoint with g_ema + -ema eval grid through the standard plotting
    ckpt = os.path.join(args.out, 'GenDisc_s1k.npz')
    meta = {'epoch': args.epochs, 'image_size': res, 'alpha': 1.0,
            'phase': top, 'image_size_init': cfg.image_size_init,
            'N_gen_features': list(cfg.n_gen_features),
            'N_dis_features': list(cfg.n_dis_features), 'latent_dim': 64}
    save_pytree_npz(ckpt, jax.tree.map(np.asarray, state2), meta)
    tree, meta2 = load_pytree_npz(ckpt)
    growth = GrowthState(cfg, phase=top, alpha=1.0)
    grid_path = os.path.join(args.out, 'ema_grid.png')
    plot_gen_samples(tree['g_ema'], cfg, growth, n_images=4, seed=0,
                     filename=grid_path)

    print(json.dumps({'metric': 'wgan_gp_train_steps_per_sec_1024_ema',
                      'value': round(sps, 3),
                      'unit': f'steps/sec (G+D, batch {args.batch}, 1024^2, '
                              'EMA shadow, incl. on-device aug)',
                      'ema_grid': grid_path,
                      'd_ema_vs_d_raw': [round(d_ema, 6), round(d_raw, 6)]}))


if __name__ == '__main__':
    main()

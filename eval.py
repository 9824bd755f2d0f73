#!/usr/bin/env python
"""Evaluation CLI — same interface as the reference's eval.py:9-26.

    python eval.py -n 20 -weights gen_dis_default.pth -output samples.png

Loads generator weights (reference ``.pth`` via the torch-free importer, or
this framework's native ``.npz``) and saves an n-sample grid.
"""

import argparse
import os

parser = argparse.ArgumentParser()
parser.add_argument('-n', type=int, default=16, help='Number of samples created')
parser.add_argument('-output', type=str, default='samples_default.png',
                    help='Filename of the output image file stored in ./images')
parser.add_argument('-weights', type=str, default='gen_dis_default.pth',
                    help='Filename of the weights stored in ./weights')
parser.add_argument('-ema', action='store_true', default=False,
                    help='Sample from the EMA shadow generator when the '
                         'checkpoint contains one (native .npz only)')
parser.add_argument('-fast', action='store_true', default=False,
                    help='Fast inference: packed conv layout + bf16 conv '
                         'passes with f32 accumulation (~1.6x throughput; '
                         'default stays true-f32 for bit-parity with the '
                         'torch reference grids)')
parser.add_argument('-swd', action='store_true', default=False,
                    help='Also score the generated samples against the real '
                         'dataset with multi-scale sliced Wasserstein '
                         'distance — the PGGAN paper\'s metric, the same one '
                         'the quality A/Bs in BASELINE.md use — and print '
                         'one JSON line')
parser.add_argument('-dataset_dir', type=str, default='',
                    help='Real-image directory for -swd '
                         '(default: config.dataset_dir)')
options = parser.parse_args()

from neuron_gan_tpu.configs import config

weights_filepath = os.path.join(config.weights_dir, options.weights)
output_filepath = os.path.join(config.images_dir, options.output)
if not os.path.exists(weights_filepath):
    raise FileNotFoundError(f'{weights_filepath} does not exist. Run setup.py.')

import jax.numpy as jnp
import jax

import neuron_gan_tpu
neuron_gan_tpu.enable_compilation_cache()

from neuron_gan_tpu.utils.plotting import plot_gen_samples

if weights_filepath.endswith('.pth'):
    from neuron_gan_tpu.checkpoint import import_reference_checkpoint
    g_params, _, model_cfg, growth, _ = import_reference_checkpoint(weights_filepath)
    g_params = jax.tree.map(jnp.asarray, g_params)
    if options.fast:
        import dataclasses
        model_cfg = dataclasses.replace(
            model_cfg, precision=None, packed_lanes=128,
            packed_min_res=max(64, 2 * model_cfg.image_size_init))
else:
    from neuron_gan_tpu.checkpoint import load_pytree_npz
    from neuron_gan_tpu.models import PGConfig, GrowthState
    tree, meta = load_pytree_npz(weights_filepath)
    state = tree if 'g_params' in tree else tree['state']
    g_key = 'g_ema' if (options.ema and 'g_ema' in state) else 'g_params'
    g_params = jax.tree.map(jnp.asarray, state[g_key])
    n_feats = tuple(meta['N_gen_features'])
    if 'image_size_init' in meta:
        init = int(meta['image_size_init'])
    elif 'phase' in meta:
        init = int(meta['image_size']) // (2 ** int(meta['phase']))
    else:
        raise ValueError(
            f'{weights_filepath} has no image_size_init/phase metadata — '
            'cannot infer the architecture. Re-save the checkpoint with the '
            'training driver, or convert it to the reference .pth format.')
    model_cfg = PGConfig(
        n_gen_features=n_feats,
        n_dis_features=tuple(meta['N_dis_features']),
        latent_dim=int(meta['latent_dim']),
        image_size_init=init,
        # older checkpoints predate these meta keys; their runs used the
        # then-only defaults, so falling back is exact for them
        n_colors=int(meta.get('N_colors', 1)),
        neg_slope=float(meta.get('LeakyReLU_leak', 0.2)),
        **({'precision': None, 'packed_lanes': 128,
            'packed_min_res': max(64, 2 * init)}
           if options.fast else {}),
    )
    growth = GrowthState(model_cfg)
    if int(meta['image_size']) > init or float(meta['alpha']) < 1.0:
        growth.set_resolution(int(meta['image_size']), float(meta['alpha']))

samples = plot_gen_samples(g_params, model_cfg, growth, n_images=options.n,
                           filename=output_filepath)
print(f'Saved {options.n} samples to {output_filepath}')

if options.swd:
    # Score against the real set with the same metric the quality A/Bs use
    # (multi-scale sliced Wasserstein distance; PGGAN paper §5).  Scored at
    # the generator's NATIVE resolution: the saved grid is nearest-upsampled
    # to image_size_max mid-growth (reference utils.py:598-600), which would
    # poison the fine SWD bands with blocking artifacts — so mid-growth
    # checkpoints are re-sampled un-upsampled and compared to reals resized
    # to the same scale.
    import json
    import numpy as np
    from neuron_gan_tpu.data import NeuronDataset
    from neuron_gan_tpu.data.augment import AugmentSpec, augment_batch
    from neuron_gan_tpu.metrics import swd_multiscale
    from neuron_gan_tpu.utils.plotting import gen_samples

    res = int(growth.image_size)
    # Always score the seed-0 latent set (the same deterministic source the
    # training-time swd_period monitor and the A/B harnesses use) rather
    # than the grid's unseeded draw — otherwise full-resolution and
    # mid-growth checkpoints would be scored on different latent sets.
    fake, _ = gen_samples(g_params, model_cfg, growth,
                          n_images=options.n, seed=0)
    fake = np.asarray(fake)
    dataset = NeuronDataset(options.dataset_dir or config.dataset_dir,
                            image_size=model_cfg.image_size_max,
                            seed=config.seed,
                            preload_limit_mb=getattr(
                                config, 'dataset_preload_limit_mb', 100.0))
    crop = model_cfg.image_size_max
    spec = AugmentSpec(crop_size=crop, out_size=res, translation=0.0,
                       augment=False)
    real = np.asarray(augment_batch(jnp.asarray(np.asarray(dataset.images)),
                                    jax.random.PRNGKey(0), spec))
    levels, mean = swd_multiscale(real, fake, jax.random.PRNGKey(123),
                                  n_patches=2048, n_repeats=8)
    print(json.dumps({'swd_mean': round(float(mean), 4),
                      'swd_levels': [round(float(v), 4) for v in levels],
                      'n_real': len(dataset), 'n_fake': int(options.n),
                      'resolution': res,
                      'alpha': round(float(min(growth.alpha, 1.0)), 4)}))

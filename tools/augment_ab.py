#!/usr/bin/env python
"""Quality A/B: exact reference-order augmentation (warp at full padded
resolution, then resize — reference data/NeuronDataset.py:113-126) vs the
fast_augment path (resize first, warp at phase scale) on a full 16->128
progressive growth run, judged by multi-scale sliced Wasserstein distance
against the real set.

The per-phase bench table (BASELINE.md) shows the full-resolution warp
gather pins every phase below 256^2 at ~20-25 steps/s; this experiment
supplies the quantitative quality evidence for making fast_augment the
default.

    python tools/augment_ab.py [--epochs 2500] [--seed 1] [--out /tmp/augment_ab]

Prints one JSON line per arm and a final verdict line.  Reuses the training
harness and synthetic dataset from precision_ab.py (both arms run at the
shipping matmul_precision='default').
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from precision_ab import build_dataset_dir, run_arm  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=2500)
    ap.add_argument('--transits', type=int, nargs='*', default=[500, 1000, 1500])
    ap.add_argument('--alpha_step', type=float, default=0.0025)
    ap.add_argument('--res', type=int, default=128)
    ap.add_argument('--seed', type=int, default=1)
    ap.add_argument('--n_fake', type=int, default=64)
    ap.add_argument('--out', type=str, default='/tmp/augment_ab')
    args = ap.parse_args()

    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from neuron_gan_tpu.data import NeuronDataset
    from neuron_gan_tpu.data.augment import AugmentSpec, augment_batch
    from neuron_gan_tpu.metrics import swd_multiscale

    os.makedirs(args.out, exist_ok=True)
    ds_dir = os.path.join(args.out, 'dataset')
    build_dataset_dir(ds_dir, args.res, seed=args.seed)
    dataset = NeuronDataset(ds_dir, image_size=args.res, seed=args.seed)

    # the real comparison set: crop + renorm, no augmentation
    spec = AugmentSpec(crop_size=args.res, out_size=args.res,
                       translation=0.0, augment=False)
    real = np.asarray(augment_batch(jnp.asarray(dataset.images),
                                    jax.random.PRNGKey(0), spec))

    results = {}
    for tag, fast in (('exact', False), ('fast', True)):
        fake, train_s = run_arm('default', dataset, args, args.out,
                                fast_augment=fast, tag=tag)
        lv, mean = swd_multiscale(real, fake, jax.random.PRNGKey(123),
                                  n_patches=2048, n_repeats=8)
        results[tag] = {'swd_mean': round(mean, 4),
                        'swd_levels': [round(float(v), 4) for v in lv],
                        'train_seconds': round(train_s, 1)}
        print(json.dumps({'arm': tag, **results[tag]}), flush=True)

    d_e = results['exact']['swd_mean']
    d_f = results['fast']['swd_mean']
    print(json.dumps({
        'verdict': 'fast_ok' if d_f <= 1.15 * d_e else 'fast_worse',
        'exact': d_e, 'fast': d_f,
        'speedup': round(results['exact']['train_seconds']
                         / results['fast']['train_seconds'], 2)}))


if __name__ == '__main__':
    main()

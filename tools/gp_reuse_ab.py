#!/usr/bin/env python
"""Quality A/B: fresh gradient-penalty fakes (the reference draws new
latents inside D_grad_pen_loss — loss_functions.py:166) vs reusing the
critic-loss fake batch for the GP interpolates (the original WGAN-GP
formulation, Gulrajani et al. 2017, which penalizes the same fake
minibatch).  Full 16->128 progressive growth, judged by multi-scale sliced
Wasserstein distance against the real set.

Reuse lets XLA CSE the duplicated generator forward out of the critic step
(measured 8.76 -> 9.91 steps/s at 512^2, +13% — BASELINE.md); this
experiment supplies the quality evidence for making it the default.

    python tools/gp_reuse_ab.py [--epochs 2500] [--seed 1] [--out /tmp/gp_reuse_ab]

Prints one JSON line per arm and a final verdict line.  Reuses the training
harness, synthetic dataset, and SWD metric from precision_ab.py; both arms
run the shipping fast_augment + matmul_precision='default' configuration.
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
    ap.add_argument('--out', type=str, default='/tmp/gp_reuse_ab')
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
    for tag, reuse in (('fresh', False), ('reuse', True)):
        fake, train_s = run_arm('default', dataset, args, args.out,
                                fast_augment=True, tag=tag,
                                gp_reuse_fakes=reuse)
        lv, mean = swd_multiscale(real, fake, jax.random.PRNGKey(123),
                                  n_patches=2048, n_repeats=8)
        results[tag] = {'swd_mean': round(mean, 4),
                        'swd_levels': [round(float(v), 4) for v in lv],
                        'train_seconds': round(train_s, 1)}
        print(json.dumps({'arm': tag, **results[tag]}), flush=True)

    d_fr = results['fresh']['swd_mean']
    d_re = results['reuse']['swd_mean']
    print(json.dumps({
        'verdict': 'reuse_ok' if d_re <= 1.15 * d_fr else 'reuse_worse',
        'fresh': d_fr, 'reuse': d_re,
        'speedup': round(results['fresh']['train_seconds']
                         / results['reuse']['train_seconds'], 2)}))


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Quality A/B: f32 matmul precision 'highest' vs 'default' (bf16 conv
passes with f32 accumulation) on a full 16->128 progressive growth run,
judged by multi-scale sliced Wasserstein distance against the real set.

Round-1 measurements (BASELINE.md) showed precision='default' is 1.7x
faster at 512^2 with favorable-but-eyeballed quality; this experiment
supplies the quantitative call (VERDICT r1, item 1).

    python tools/precision_ab.py [--epochs 2500] [--out /tmp/precision_ab]

Prints one JSON line per arm and a final verdict line.  Sample grids and
the synthetic dataset land in --out for inspection.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def make_synthetic_neurons(n=16, res=512, seed=0):
    """Branching-filament images that mimic the dataset's statistics: dark
    noisy background, bright dendritic arbor (random-walk branches from a
    soma), a few bright blobs.  uint8 grayscale."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = np.zeros((res, res), np.float32)
        cy, cx = rng.uniform(res * 0.3, res * 0.7, 2)
        # soma
        ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing='ij')
        img += 200 * np.exp(-(((ys - cy) ** 2 + (xs - cx) ** 2)
                              / (2 * (res * 0.01) ** 2)))
        # branches: biased random walks that occasionally fork
        stack = [(cy, cx, rng.uniform(0, 2 * np.pi), int(res * 0.9))]
        while stack:
            y, x, ang, steps = stack.pop()
            for _ in range(steps):
                y += np.sin(ang)
                x += np.cos(ang)
                ang += rng.normal(0, 0.08)
                if not (0 <= y < res and 0 <= x < res):
                    break
                iy, ix = int(y), int(x)
                img[max(iy - 1, 0):iy + 1, max(ix - 1, 0):ix + 1] = \
                    np.maximum(img[max(iy - 1, 0):iy + 1,
                                   max(ix - 1, 0):ix + 1],
                               rng.uniform(120, 220))
                if rng.random() < 0.01:
                    stack.append((y, x, ang + rng.choice([-1, 1])
                                  * rng.uniform(0.4, 1.2),
                                  int(steps * 0.6)))
        # background noise + guaranteed zero pixels for the Otsu fill path
        img += rng.normal(18, 5, (res, res))
        img[:4, :4] = 0
        out.append(img.clip(0, 255).astype(np.uint8))
    return out


def build_dataset_dir(path, res, seed=0, n=16):
    from PIL import Image
    os.makedirs(path, exist_ok=True)
    # key the cache on the actual parameters — counting PNGs alone would
    # silently reuse a stale dataset across --seed/--res values, collapsing
    # the across-seed spread ab_aggregate calibrates against
    meta_path = os.path.join(path, '.dataset_meta.json')
    key = {'res': res, 'seed': seed, 'n': n}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            if json.load(fh) == key and len(
                    [f for f in os.listdir(path) if f.endswith('.png')]) == n:
                return
    for f in os.listdir(path):
        if f.endswith('.png'):
            os.remove(os.path.join(path, f))
    for i, img in enumerate(make_synthetic_neurons(n=n, res=res, seed=seed)):
        Image.fromarray(img, mode='L').save(os.path.join(path, f'n{i:02d}.png'))
    with open(meta_path, 'w') as fh:
        json.dump(key, fh)


def run_arm(precision_name, dataset, args, out_dir, fast_augment=False,
            tag=None, compute_dtype='float32', gp_reuse_fakes=False,
            shear_warp=False, packed_lanes=None):
    import jax
    import jax.numpy as jnp
    from neuron_gan_tpu.models import (
        PGConfig, GrowthState, init_generator_pg, init_discriminator_pg,
        generator_pg)
    from neuron_gan_tpu.schedule import TrainSchedule
    from neuron_gan_tpu.train_step import (
        ChunkSpec, make_epoch_runner, make_optimizer, init_train_state)
    from neuron_gan_tpu.utils.latents import sample_latent_vec
    from neuron_gan_tpu.utils.plotting import save_image_grid

    precision = None if precision_name == 'default' else precision_name
    cfg = PGConfig(
        n_gen_features=(64, 32, 16, 16), n_dis_features=(16, 16, 32, 64),
        latent_dim=64, image_size_init=16, precision=precision,
        packed_min_res=64, compute_dtype=compute_dtype,
        packed_lanes=packed_lanes)
    # checkpointing_period = full run: no artifact boundaries, so chunks are
    # cut only by transitions/fade-ends — 7 executables for the whole run
    sched = TrainSchedule(transit_sch=tuple(args.transits),
                          alpha_step=args.alpha_step, n_epochs=args.epochs,
                          checkpointing_period=args.epochs, lr0=1e-4)

    kg, kd = jax.random.split(jax.random.PRNGKey(args.seed))
    state = init_train_state(init_generator_pg(kg, cfg),
                             init_discriminator_pg(kd, cfg),
                             make_optimizer(0.5, False))
    images_stack = jnp.asarray(dataset.images)
    run_key = jax.random.PRNGKey(args.seed + 977)

    t0 = time.time()
    for start, end in sched.plan_chunks(1, args.epochs + 1):
        phase = sched.phase_at(start)
        fading, f0 = sched.fading_at(start)
        lrp = sched.lr_phase_of_chunk(start)
        spec = ChunkSpec(
            phase=phase, fading=fading, n_critic=1, batch_size=8,
            n_images=len(dataset), shuffle=True,
            crop_size=dataset.image_size_max, translation=0.05, augment=True,
            gp_lambda=10.0, drift_epsilon=0.001, sim_lambda0=0.0,
            sim_decay=0.0, beta1=0.5, rmsprop=False, lr0=1e-4,
            lr_gamma=float(sched.gammas[lrp]),
            lr_boundary=int(sched.boundaries[lrp]),
            lr_cap=int(sched.phase_lens[lrp] // 2),
            lr_prev_final=float(sched.lr_at(start)),
            alpha_start=f0, alpha_step=args.alpha_step, latent_dim=64,
            fast_augment=fast_augment, gp_reuse_fakes=gp_reuse_fakes,
            shear_warp=shear_warp)
        runner = make_epoch_runner(cfg, spec, end - start + 1, donate=True)
        state, stats = runner(state, images_stack, run_key, start)
        stats = np.asarray(stats)
        assert np.isfinite(stats).all(), f'NaN at chunk {start}-{end}'
        print(f'[{tag or precision_name}] epochs {start}-{end} phase {phase} '
              f'fade={fading} D={stats[-1, 2]:+.3f} G={stats[-1, 3]:+.3f}',
              flush=True)
    train_s = time.time() - t0

    # final samples at the top resolution
    n_fake = args.n_fake

    @jax.jit
    def sample(params, key):
        z = sample_latent_vec(key, (n_fake, cfg.latent_dim))
        return generator_pg(params, z, cfg, cfg.n_phases - 1)

    fake = np.asarray(sample(state['g_params'], jax.random.PRNGKey(7)))
    save_image_grid(fake[:16],
                    os.path.join(out_dir,
                                 f'samples_{tag or precision_name}_s{args.seed}.png'))
    return fake, train_s


def make_quality_ab_parser(default_out):
    """Shared CLI for the two-arm quality A/B tools."""
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=2500)
    ap.add_argument('--transits', type=int, nargs='*', default=[500, 1000, 1500])
    ap.add_argument('--alpha_step', type=float, default=0.0025)
    ap.add_argument('--res', type=int, default=128)
    ap.add_argument('--seed', type=int, default=1)
    ap.add_argument('--n_fake', type=int, default=64)
    ap.add_argument('--out', type=str, default=default_out)
    return ap


def run_quality_ab(args, arms, verdict_ok, verdict_worse):
    """Shared body of the two-arm quality A/B tools (mixed_ab, gp_reuse_ab,
    preset_ab): build the synthetic dataset, train each arm with run_arm,
    score vs the real set with multi-scale SWD, and print per-arm JSON plus
    a final verdict line comparing the second arm to the first at the 1.15x
    bar.  ``arms`` = [(tag, run_arm_kwargs), (tag, run_arm_kwargs)].
    """
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
    real = np.asarray(augment_batch(jnp.asarray(np.asarray(dataset.images)),
                                    jax.random.PRNGKey(0), spec))

    results = {}
    for tag, kw in arms:
        # shipping defaults (fast_augment + shear_warp='auto' + mixed
        # compute + GP-fake reuse + full-lane 2x4 packing, all
        # SWD-promoted); arms may override, including matmul precision via
        # 'precision_name'.  NOTE: only the fused BOUNDARY kernels gate on
        # precision; the packed8 block-interior sandwich gates on
        # packed_lanes alone (models/pggan.py::_use_packed8), so any
        # reference/exact arm must pin 'packed_lanes': None itself or it
        # runs float-reordered packed8 interior convs at the 16-feature
        # levels (lanes_ab.py / stacked_ab.py do pin it).
        kw = {'fast_augment': True, 'shear_warp': 'auto',
              'compute_dtype': 'mixed', 'gp_reuse_fakes': True,
              'packed_lanes': 128, **kw}
        precision_name = kw.pop('precision_name', 'default')
        fake, train_s = run_arm(precision_name, dataset, args, args.out,
                                tag=tag, **kw)
        lv, mean = swd_multiscale(real, fake, jax.random.PRNGKey(123),
                                  n_patches=2048, n_repeats=8)
        results[tag] = {'swd_mean': round(mean, 4),
                        'swd_levels': [round(float(v), 4) for v in lv],
                        'train_seconds': round(train_s, 1)}
        print(json.dumps({'arm': tag, **results[tag]}), flush=True)

    (base_tag, _), (cand_tag, _) = arms
    d_b = results[base_tag]['swd_mean']
    d_c = results[cand_tag]['swd_mean']
    print(json.dumps({
        # single-seed ratios sit inside GAN seed noise (the baseline arm
        # fails the 1.15x bar against its own reruns — BASELINE.md); the
        # promotion decision is tools/ab_aggregate.py over >= 4 seeds
        'seed_verdict_hint': verdict_ok if d_c <= 1.15 * d_b else verdict_worse,
        base_tag: d_b, cand_tag: d_c,
        'speedup': round(results[base_tag]['train_seconds']
                         / results[cand_tag]['train_seconds'], 2)}))
    return results


def main():
    # Round-5 regeneration arms (VERDICT r4 item 2): the matmul-precision
    # knob at 6 seeds under the shipping stack's SEMANTICS (fast augment,
    # shear auto, GP-fake reuse on both arms) with float32 activations on
    # both arms — the knob's worst-case numerics divergence (one bf16 conv
    # pass over f32 data; under compute_dtype='mixed' the operands are
    # bf16 anyway and the knob barely bites).  The 'default' arm routes
    # the precision-gated fused boundary kernels and the packed8 layout,
    # exactly what ships when a user sets compute_dtype='float32'; the
    # 'highest' arm is the full exact-decomposition parity path
    # (packed_lanes=None — see the run_quality_ab note).
    args = make_quality_ab_parser('/tmp/precision_ab').parse_args()
    run_quality_ab(args,
                   arms=[('highest', {'precision_name': 'highest',
                                      'compute_dtype': 'float32',
                                      'packed_lanes': None}),
                         ('default', {'precision_name': 'default',
                                      'compute_dtype': 'float32'})],
                   verdict_ok='default_ok', verdict_worse='default_worse')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Benchmark: full WGAN-GP G+D train step throughput at 512x512.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The metric is combined G+D WGAN-GP steps/sec at the reference's flagship
configuration (config_ex.py: 512x512, batch 8, latent 64, n_critic 1,
lambda_gp 10, drift 1e-3), including the on-device augmentation pipeline —
i.e., end-to-end training epochs per second times batches per epoch.

The baseline divisor is the torch-reference equivalent measured on the
available reference hardware (CPU; the reference repo supports cpu/mps/cuda
and none was published — see BASELINE.md).  TORCH_REF_STEPS_PER_SEC below
records that measurement; rerun with --measure-torch to refresh it.
"""

import json
import sys
import time

import numpy as np

# Measured via `python bench.py --measure-torch` on this machine's CPU
# (the only hardware the torch reference can run on here); see BASELINE.md.
TORCH_REF_STEPS_PER_SEC = 0.0127  # 2026-08-16, torch 2.13 CPU, 1 core


V5E_HBM_GBPS = 819  # TPU v5e peak HBM bandwidth (public spec), GB/s


def bench_tpu(n_epochs_chunk=10, phase=None, fading=False, fast_augment=True,
              shear_warp='auto', compute_dtype='mixed', gp_reuse_fakes=True,
              pallas_epilogue=None, pallas_conv=None, unroll=1,
              packed_lanes=128, gp_remat=False, roofline=None, batch=8):
    """Train-step throughput at one growth phase (default: top, 512x512).

    ``phase``/``fading`` select the per-phase measurement for the SURVEY §6
    table (a full growth run spends 5/6 of its transitions below the top
    resolution; reference monitor hook train.py:404-407).

    ``fast_augment`` defaults to True = the shipping config default
    (config.fast_augment): phase-scale jitter + crop-fused warp.  Pass
    False for the reference-exact augmentation order.
    """
    import jax
    import jax.numpy as jnp
    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()
    from neuron_gan_tpu.models import (
        init_generator_pg, init_discriminator_pg)
    from neuron_gan_tpu.train_step import (
        make_epoch_runner, make_optimizer, init_train_state)
    from neuron_gan_tpu.flagship import flagship_config, flagship_chunk_spec

    # the shipping flagship configuration (shared with the profiling tools
    # so promoted defaults cannot drift out of the measurement stack)
    cfg = flagship_config(compute_dtype=compute_dtype,
                          pallas_epilogue=pallas_epilogue,
                          pallas_conv=pallas_conv,
                          packed_lanes=packed_lanes)
    if phase is None:
        phase = cfg.n_phases - 1
    # batch 8 = the reference geometry (config_ex.py); --batch measures
    # larger-batch throughput headroom (n_images scales so batch always
    # divides the epoch — the real dataset is 16 images, so batch > 16 is
    # a throughput-mode measurement, not the reference workload)
    n_images = max(16, batch)
    spec = flagship_chunk_spec(
        phase, fading=fading, fast_augment=fast_augment,
        shear_warp=shear_warp, gp_reuse_fakes=gp_reuse_fakes,
        gp_remat=gp_remat, batch_size=batch,
        n_images=n_images)

    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = init_generator_pg(kg, cfg)
    d = init_discriminator_pg(kd, cfg)
    opt = make_optimizer()
    state = init_train_state(g, d, opt)

    rng = np.random.default_rng(0)
    # padded 768x768 stack like the real dataset (512 + 2*128)
    images = jnp.asarray(rng.random((n_images, 768, 768, 1)).astype(np.float32))

    batches_per_epoch = n_images // batch
    # One jitted call scans n_epochs_chunk epochs — per-dispatch overhead is
    # amortized exactly as in training.  np.asarray forces a true host sync
    # (block_until_ready alone returns early through the axon relay).
    runner = make_epoch_runner(cfg, spec, n_epochs=n_epochs_chunk, donate=False,
                               unroll=unroll)

    state, stats = runner(state, images, jax.random.PRNGKey(0), 1)  # compile
    np.asarray(stats)

    t0 = time.perf_counter()
    state, stats = runner(state, images, jax.random.PRNGKey(1), 1 + n_epochs_chunk)
    stats_host = np.asarray(stats)
    dt = time.perf_counter() - t0
    assert np.isfinite(stats_host).all(), 'non-finite training stats'
    value = n_epochs_chunk * batches_per_epoch / dt  # G+D steps/sec
    if roofline is not None:
        # HBM roofline estimate from XLA's own cost model: 'bytes accessed'
        # of the timed executable / steps, and the implied fraction of v5e
        # peak HBM bandwidth at the measured rate.  XLA counts bytes at the
        # HLO level (fusions may keep some of them in VMEM), so this is an
        # UPPER bound on true HBM traffic — %-of-roofline is correspondingly
        # an upper bound; the op-trace BW column (tools/op_trace.py) gives
        # the per-op measured view (BASELINE.md round-3 decomposition).
        try:
            compiled = runner.lower(state, images,
                                    jax.random.PRNGKey(1),
                                    1 + n_epochs_chunk).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            total = float(ca.get('bytes accessed', 0.0))
            if total > 0:
                per_step = total / (n_epochs_chunk * batches_per_epoch)
                roofline['hbm_gb_per_step'] = round(per_step / 1e9, 3)
                roofline['hbm_roofline_pct'] = round(
                    100.0 * per_step * value / (V5E_HBM_GBPS * 1e9), 1)
        except Exception as e:  # cost analysis is best-effort diagnostics
            roofline['error'] = f'{type(e).__name__}: {e}'
    return value


def bench_mesh(mesh_shape, phase=2, n_epochs_chunk=5):
    """Mesh-sharded train-step throughput: the SHIPPING step jitted over a
    jax.sharding.Mesh with the batch sharded on 'data' (and conv output
    channels on 'model' when present) — exactly the layout train.py builds
    for config.mesh_shape (parallel/mesh.py).

    This host has ONE real TPU chip, so a mesh larger than the real device
    count falls back to a VIRTUAL CPU mesh (jax_num_cpu_devices).  That
    validates the sharded executable + collective layout end-to-end, but it
    times XLA:CPU collective emulation on one core — a MECHANISM check, not
    an ICI scaling claim (the returned record says which backend ran; on a
    real multi-chip slice the same code path measures true scaling).

    Returns the JSON record: sharded steps/s, the single-device steps/s of
    the same executable geometry on the same backend (isolating the
    sharding/collective overhead), mesh shape, backend, and geometry.

    Geometry: the full flagship model on a real multi-device backend; on
    the virtual CPU fallback a reduced production-layout config (the
    dryrun_multichip geometry: (16,8,8) features, packed 64^2 top phase,
    mixed compute, fused kernels) — the flagship's dp x tp step takes XLA:CPU
    >10 min to compile, which would make the mode unrunnable exactly where
    it must run.
    """
    import jax
    n = 1
    for v in mesh_shape.values():
        n *= int(v)
    backend = jax.default_backend()
    if len(jax.devices()) < n:
        import jax.extend.backend
        jax.extend.backend.clear_backends()
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_num_cpu_devices', n)
        backend = 'cpu-virtual'
    else:
        import neuron_gan_tpu
        neuron_gan_tpu.enable_compilation_cache()
    import jax.numpy as jnp
    from neuron_gan_tpu.models import (
        PGConfig, init_generator_pg, init_discriminator_pg)
    from neuron_gan_tpu.parallel import make_mesh, shard_params, replicate
    from neuron_gan_tpu.train_step import (
        make_epoch_runner, make_optimizer, init_train_state)
    from neuron_gan_tpu.flagship import flagship_config, flagship_chunk_spec

    if backend == 'cpu-virtual':
        cfg = PGConfig(n_gen_features=(16, 8, 8), n_dis_features=(8, 8, 16),
                       latent_dim=16, image_size_init=16, packed_min_res=64,
                       packed_lanes=128, precision=None,
                       compute_dtype='mixed')
        phase = min(phase, cfg.n_phases - 1)
        geometry = ('reduced (dryrun-scale, packed_lanes=128 native-2x4 '
                    '64^2 top)')
        pad = cfg.resolution(cfg.n_phases - 1)  # 64 + 2*16 crop padding
        crop = pad
        image_hw = pad + pad // 2
    else:
        cfg = flagship_config()
        geometry = 'flagship'
        crop, image_hw = 512, 768
    data = int(mesh_shape.get('data', 1))
    batch = data * max(1, 8 // data)  # >= the flagship batch 8, divisible
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images_host = rng.random((16, image_hw, image_hw, 1)).astype(np.float32)

    def measure(mesh, data_axis):
        spec = flagship_chunk_spec(phase, batch_size=batch,
                                   data_axis=data_axis, crop_size=crop,
                                   latent_dim=cfg.latent_dim)
        state = init_train_state(init_generator_pg(kg, cfg),
                                 init_discriminator_pg(kd, cfg),
                                 make_optimizer())
        if mesh is not None:
            state = {k: shard_params(v, mesh) for k, v in state.items()}
        images = replicate(jnp.asarray(images_host), mesh)
        runner = make_epoch_runner(cfg, spec, n_epochs=n_epochs_chunk,
                                   donate=False)
        import contextlib
        ctx = (jax.sharding.set_mesh(mesh) if mesh is not None
               else contextlib.nullcontext())
        with ctx:
            state, stats = runner(state, images, jax.random.PRNGKey(0), 1)
            np.asarray(stats)  # compile + true host sync
            t0 = time.perf_counter()
            state, stats = runner(state, images, jax.random.PRNGKey(1),
                                  1 + n_epochs_chunk)
            stats_host = np.asarray(stats)
        dt = time.perf_counter() - t0
        assert np.isfinite(stats_host).all(), 'non-finite training stats'
        return n_epochs_chunk * (16 // batch) / dt

    mesh = make_mesh(mesh_shape)
    sharded = measure(mesh, 'data' if 'data' in mesh_shape else None)
    single = measure(None, None)
    res = cfg.resolution(phase)
    return {
        'metric': f'mesh_train_steps_per_sec_{res}',
        'value': round(sharded, 3),
        'unit': f'steps/sec (G+D, batch {batch}, {res}x{res}, '
                f'sharded over {mesh_shape})',
        'vs_baseline': None,
        'mesh_shape': mesh_shape,
        'backend': backend,
        'geometry': geometry,
        'single_device_steps_per_sec': round(single, 3),
        'note': ('mechanism measurement: virtual CPU mesh emulates '
                 'collectives on one core, not ICI'
                 if backend == 'cpu-virtual' else
                 'real multi-device mesh'),
    }


def bench_eval(n_images=20, n_iters=20, fast=False):
    """Generator inference throughput: images/sec for a 20-image grid at
    512x512 (BASELINE.md north-star metric #2).

    Default numerics = the eval CLI's default (true-f32, unpacked — grid
    bit-parity with the torch reference); ``fast`` mirrors ``eval.py -fast``
    (packed layout + bf16 conv passes, ~1.6x)."""
    import jax
    import jax.numpy as jnp
    import neuron_gan_tpu
    neuron_gan_tpu.enable_compilation_cache()
    from neuron_gan_tpu.models import PGConfig, init_generator_pg, generator_pg
    from neuron_gan_tpu.utils.latents import sample_latent_vec

    cfg = PGConfig(
        n_gen_features=(128, 64, 32, 32, 16, 16),
        n_dis_features=(16, 16, 32, 32, 64, 128),
        latent_dim=64, image_size_init=16, n_colors=1,
        **({'precision': None, 'packed_min_res': 64, 'packed_lanes': 128}
           if fast else {}),
    )
    params = init_generator_pg(jax.random.PRNGKey(0), cfg)

    # All n_iters grids inside ONE jitted scan: the round-4 re-measure was
    # abandoned because a python loop of per-grid dispatches is
    # relay-dispatch-bound (an UNCHANGED executable swung 3x with host
    # conditions — BASELINE.md).  Scanning amortizes dispatch exactly the
    # way the training bench does; each scan iteration still materializes
    # the full grid on device (the reduce that keeps the carry small reads
    # it afterwards).
    from jax import lax

    @jax.jit
    def grids(params, key):
        def body(k, _):
            k, sub = jax.random.split(k)
            z = sample_latent_vec(sub, (n_images, cfg.latent_dim))
            img = generator_pg(params, z, cfg, cfg.n_phases - 1)
            return k, img.astype(jnp.float32).mean()
        _, means = lax.scan(body, key, None, length=n_iters)
        return means.sum()

    np.asarray(grids(params, jax.random.PRNGKey(0)))  # compile + warm
    best = float('inf')
    for rep in range(3):
        t0 = time.perf_counter()
        np.asarray(grids(params, jax.random.PRNGKey(rep + 1)))
        best = min(best, time.perf_counter() - t0)
    return n_images * n_iters / best


def bench_torch_reference(n_steps=2, phase=5):
    """Equivalent measurement of the torch reference's hot loop on CPU:
    per batch = 1 critic step (D loss + GP double-backward + Adam) + 1 G step,
    on the same architecture/sizes.  Uses plain torch modules implementing
    the documented reference semantics.  ``phase`` truncates the growth
    state (resolution 16 * 2**phase), mirroring the reference mid-growth."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    import math

    torch.set_num_threads(max(1, __import__('os').cpu_count()))

    feats_g = [128, 64, 32, 32, 16, 16][:phase + 1]
    feats_d = [16, 16, 32, 32, 64, 128][-(phase + 1):]
    latent, init, batch = 64, 16, 8
    res = init * 2 ** phase
    gain = torch.nn.init.calculate_gain('leaky_relu', 0.2)

    class EqConv(nn.Conv2d):
        def forward(self, x):
            fan = self.weight.shape[1] * self.weight.shape[2] * self.weight.shape[3]
            return super().forward((gain / math.sqrt(fan)) * x)

    def pn(x):
        return x / torch.sqrt(torch.mean(x ** 2, dim=1, keepdim=True) + 1e-8)

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = nn.Linear(latent, feats_g[0] * init * init, bias=False)
            self.conv0 = EqConv(feats_g[0], feats_g[0], 3, padding=1, bias=False)
            self.blocks = nn.ModuleList()
            for i in range(len(feats_g) - 1):
                self.blocks.append(nn.ModuleList([
                    EqConv(feats_g[i], feats_g[i + 1], 3, padding=1, bias=False),
                    EqConv(feats_g[i + 1], feats_g[i + 1], 3, padding=1, bias=False)]))
            self.to_rgb = nn.Conv2d(feats_g[-1], 1, 1, bias=False)

        def forward(self, z):
            x = self.lin((gain / math.sqrt(latent)) * z)
            x = x.view(-1, feats_g[0], init, init)
            x = pn(F.leaky_relu(x, 0.2))
            x = pn(F.leaky_relu(self.conv0(x), 0.2))
            for c1, c2 in self.blocks:
                x = F.interpolate(x, scale_factor=2, mode='bilinear')
                x = pn(F.leaky_relu(c1(x), 0.2))
                x = pn(F.leaky_relu(c2(x), 0.2))
            return torch.tanh(self.to_rgb(x))

    class D(nn.Module):
        def __init__(self):
            super().__init__()
            self.from_rgb = nn.Conv2d(1, feats_d[0], 1)
            self.blocks = nn.ModuleList()
            for i in range(len(feats_d) - 1):
                self.blocks.append(nn.ModuleList([
                    EqConv(feats_d[i], feats_d[i + 1], 3, padding=1, bias=False),
                    EqConv(feats_d[i + 1], feats_d[i + 1], 3, padding=1, bias=False)]))
            self.conv = EqConv(feats_d[-1], feats_d[-1], 3, padding=1)
            self.out = EqConv(feats_d[-1], 1, init)

        def forward(self, x):
            y = self.from_rgb(x)
            for c1, c2 in self.blocks:
                y = F.avg_pool2d(y, 2)
                y = pn(F.leaky_relu(c1(y), 0.2))
                y = pn(F.leaky_relu(c2(y), 0.2))
            y = pn(F.leaky_relu(self.conv(y), 0.2))
            return self.out(y).flatten(1)

    g, d = G(), D()
    opt_g = torch.optim.Adam(g.parameters(), lr=1e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=1e-4, betas=(0.5, 0.999))
    images = torch.randn(batch, 1, res, res)

    def one_step():
        # critic step with GP (double backward)
        d.zero_grad()
        z = torch.randn(batch, latent)
        fake = g(z).detach()
        loss = -d(images).mean() + d(fake).mean() + 1e-3 * d(images).pow(2).mean()
        eps = torch.rand(batch, 1, 1, 1)
        x_hat = (eps * images + (1 - eps) * fake).requires_grad_()
        grad = torch.autograd.grad(d(x_hat).sum(), x_hat, create_graph=True)[0]
        loss = loss + 10.0 * ((grad.norm(2, dim=(1, 2, 3)) - 1) ** 2).mean()
        loss.backward()
        opt_d.step()
        # generator step
        g.zero_grad()
        gl = -d(g(torch.randn(batch, latent))).mean()
        gl.backward()
        opt_g.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        one_step()
    return n_steps / (time.perf_counter() - t0)


def bench_all_phases(fast_augment=True):
    """Per-phase throughput table (SURVEY §6): steps/s for 16..512, steady
    and fading."""
    rows = []
    for phase in range(6):
        res = 16 * 2 ** phase
        for fading in ((False,) if phase == 0 else (False, True)):
            sps = bench_tpu(phase=phase, fading=fading,
                            fast_augment=fast_augment)
            rows.append({'resolution': res, 'fading': fading,
                         'fast_augment': fast_augment,
                         'steps_per_sec': round(sps, 3)})
            print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == '__main__':
    if '--unroll' in sys.argv and any(
            f in sys.argv for f in ('--measure-torch', '--all-phases',
                                    '--phase', '--eval', '--metric=eval',
                                    '--preset')):
        print('warning: --unroll only applies to the default headline '
              'measurement and is ignored by this branch', file=sys.stderr)
    if '--measure-torch' in sys.argv:
        if '--phase' in sys.argv:
            phase = int(sys.argv[sys.argv.index('--phase') + 1])
            sps = bench_torch_reference(n_steps=max(2, 2 ** (6 - phase)),
                                        phase=phase)
            print(json.dumps({'torch_ref_steps_per_sec': sps,
                              'resolution': 16 * 2 ** phase}))
        else:
            sps = bench_torch_reference()
            print(json.dumps({'torch_ref_steps_per_sec': sps}))
        sys.exit(0)
    if '--all-phases' in sys.argv:
        bench_all_phases(fast_augment='--exact-augment' not in sys.argv)
        sys.exit(0)
    if '--phase' in sys.argv:
        i = sys.argv.index('--phase')
        phase = int(sys.argv[i + 1])
        fading = '--fading' in sys.argv
        sps = bench_tpu(phase=phase, fading=fading,
                        fast_augment='--exact-augment' not in sys.argv)
        print(json.dumps({
            'metric': f'wgan_gp_train_steps_per_sec_{16 * 2 ** phase}'
                      + ('_fading' if fading else ''),
            'value': round(sps, 3),
            'unit': 'steps/sec (G+D, batch 8, incl. on-device aug)',
            'vs_baseline': None}))
        sys.exit(0)
    if '--metric=eval' in sys.argv or '--eval' in sys.argv:
        fast = '--fast' in sys.argv
        ips = bench_eval(fast=fast)
        print(json.dumps({'metric': 'eval_images_per_sec_512'
                                    + ('_fast' if fast else ''),
                          'value': round(ips, 2),
                          'unit': 'images/sec (20-image grids, 512x512)',
                          'vs_baseline': None}))
        sys.exit(0)

    if '--mesh' in sys.argv:
        # bench.py --mesh data=8 [--phase N] — mesh-sharded shipping step
        # (virtual CPU mesh when the host lacks the devices; see bench_mesh)
        i = sys.argv.index('--mesh')
        if i + 1 >= len(sys.argv):
            sys.exit('--mesh requires a shape, e.g. --mesh data=8 or '
                     '--mesh data=4,model=2')
        try:
            shape = {k: int(v) for k, v in
                     (kv.split('=') for kv in sys.argv[i + 1].split(','))}
        except ValueError:
            sys.exit(f'bad mesh shape {sys.argv[i + 1]!r}; expected e.g. '
                     'data=4,model=2')
        phase = (int(sys.argv[sys.argv.index('--phase') + 1])
                 if '--phase' in sys.argv else 2)
        print(json.dumps(bench_mesh(shape, phase=phase)))
        sys.exit(0)

    if '--preset' in sys.argv:
        # the config_fast preset: every measured opt-in speed knob together
        # (compute_dtype='mixed', gp_reuse_fakes, shear_warp — BASELINE.md)
        value = bench_tpu(shear_warp=True, compute_dtype='mixed',
                          gp_reuse_fakes=True)
        baseline = TORCH_REF_STEPS_PER_SEC
        print(json.dumps({
            'metric': 'wgan_gp_train_steps_per_sec_512_config_fast',
            'value': round(value, 3),
            'unit': 'steps/sec (G+D, batch 8, 512x512, incl. on-device aug)',
            'vs_baseline': round(value / baseline, 2) if baseline else None,
        }))
        sys.exit(0)

    # shear_warp='auto' is the shipping default (per-phase max(gather,
    # shear) since the 6-seed SWD promotion — BASELINE.md); --no-shear
    # measures the point-gather warp everywhere instead
    unroll = 1
    if '--unroll' in sys.argv:
        i = sys.argv.index('--unroll')
        if i + 1 >= len(sys.argv):
            sys.exit('--unroll requires an integer value (batch-scan unroll '
                     'factor), e.g. --unroll 2')
        try:
            unroll = int(sys.argv[i + 1])
        except ValueError:
            sys.exit(f'--unroll expects an integer, got {sys.argv[i + 1]!r}')
        if unroll < 1:
            sys.exit('--unroll must be >= 1')
    batch = 8
    if '--batch' in sys.argv:
        # throughput-mode measurement at a non-reference batch (the real
        # dataset is 16 images; batch 8 is the config_ex.py geometry)
        i = sys.argv.index('--batch')
        if i + 1 >= len(sys.argv):
            sys.exit('--batch requires an integer, e.g. --batch 16')
        try:
            batch = int(sys.argv[i + 1])
        except ValueError:
            sys.exit(f'--batch expects an integer, got {sys.argv[i + 1]!r}')
        if batch < 1:
            sys.exit('--batch must be >= 1')
    roofline = {}
    value = bench_tpu(shear_warp=(False if '--no-shear' in sys.argv
                                  else 'auto'),
                      pallas_epilogue=(True if '--pallas-epilogue'
                                       in sys.argv else None),
                      pallas_conv=(True if '--pallas-conv' in sys.argv
                                   else None),
                      packed_lanes=(None if '--lanes-64' in sys.argv
                                    else 128),
                      gp_remat=('--remat-gp' in sys.argv),
                      unroll=unroll, roofline=roofline, batch=batch)
    baseline = TORCH_REF_STEPS_PER_SEC
    vs = (value / baseline) if baseline and batch == 8 else None
    record = {
        'metric': 'wgan_gp_train_steps_per_sec_512',
        'value': round(value, 3),
        'unit': f'steps/sec (G+D, batch {batch}, 512x512, '
                'incl. on-device aug)',
        'vs_baseline': round(vs, 2) if vs else None,
    }
    if batch != 8:
        record['metric'] += f'_batch{batch}'
        record['batch'] = batch
        record['samples_per_sec'] = round(value * batch, 1)
    if 'hbm_gb_per_step' in roofline:
        # upper-bound HBM traffic (XLA cost model) and implied % of v5e peak
        record.update(roofline)
    # non-default knobs must be distinguishable from a baseline measurement
    if unroll != 1:
        record['metric'] += f'_unroll{unroll}'
        record['unroll'] = unroll
    for flag, key in (('--pallas-conv', 'pallas_conv'),
                      ('--pallas-epilogue', 'pallas_epilogue'),
                      ('--lanes-64', 'packed_lanes_64'),
                      ('--remat-gp', 'gp_remat'),
                      ('--no-shear', 'no_shear')):
        if flag in sys.argv:
            record['metric'] += '_' + key
            record[key] = True
    print(json.dumps(record))

#!/usr/bin/env python
"""Training CLI — same interface as the reference's train.py.

    python train.py --configs my_config [--flag value ...]

Flag set, precedence (defaults < config module < explicit CLI flags), ID
collision prompt, seeding, dataset/model construction, checkpoint/resume,
monitoring line, and checkpoint-time artifacts all mirror reference
train.py:39-451.  The execution engine differs by design: training runs as
jitted epoch *chunks* (see neuron_gan_tpu/train_step.py) — one XLA
executable per (phase, fading?, n_critic), with fade-in alpha, LR decay and
loss-weight schedules computed in-graph so the 150k-epoch run is a handful
of compilations.
"""

import argparse
import json
import os
import re
import sys
import time
import uuid
from collections import OrderedDict

import numpy as np

FILENAME_FORMAT = '{prefix}_{ID}.{ext}'

# ---------------------------------------------------------------- arguments
parser = argparse.ArgumentParser()
parser.add_argument('--configs', type=str, default='',
                    help='Filename of configurations stored in ./configs')
parser.add_argument('--root_dir', type=str, default=os.path.dirname(__file__))
parser.add_argument('--dataset_dir', type=str, default='./data/real_images',
                    help='Dataset directory where real images are stored')
parser.add_argument('--images_dir', type=str, default='./images')
parser.add_argument('--weights_dir', type=str, default='./weights')
parser.add_argument('--plots_dir', type=str, default='./plots')

# WGAN config
parser.add_argument('--wgan', action='store_true',
                    help='Use the Wasserstein loss function and network')
parser.add_argument('--n_critic', type=int, default=5,
                    help='Number of critic learning iterations in wgan training')
parser.add_argument('--adapt_critic', action='store_true', default=False,
                    help='Adapt the number critic training steps')
parser.add_argument('--unroll_steps', type=int, default=0,
                    help='Number of unrolled discriminator steps (Unrolled GAN)')
parser.add_argument('--weights_init', type=str, default='',
                    help='Path to weights dict used to initialize networks')
parser.add_argument('--dis_weights', type=str, default='',
                    help='Path to weights of discriminator')

# PGGAN config
parser.add_argument('--pggan', action='store_true',
                    help='Use the Progressively Growing network')
parser.add_argument('--grad_pen_lambda', type=float, default=0.0)
parser.add_argument('--transit_sch', type=float,
                    default=[50, 100, 150, 200, 250, 300, 350], nargs='*')
parser.add_argument('--transit_period', type=int, default=None)
parser.add_argument('--alpha_step', type=float, default=0.05)

# Training
parser.add_argument('--RMSprop', action='store_true', default=False)
parser.add_argument('--learning_rate', type=float, default=0.00002)
parser.add_argument('--batch_size', type=int, default=8)
parser.add_argument('--N_epochs', type=int, default=1000)
parser.add_argument('--beta1', type=float, default=0.8)
parser.add_argument('--sim_loss_lambda', type=float, default=0.0)
parser.add_argument('--sim_loss_lambda_decay_rate', type=float, default=0.0)
parser.add_argument('--drift_epsilon', type=float, default=0.001)

# Misc
parser.add_argument('--ID', type=str, default=uuid.uuid4().hex[:4])
parser.add_argument('--resume', action='store_true', default=False)
parser.add_argument('--seed', type=int, default=1)
parser.add_argument('--checkpointing_period', type=int, default=100)
parser.add_argument('--translation', type=float, default=0.0)
parser.add_argument('--device', type=str, default='default',
                    choices=['cpu', 'tpu', 'default'])
parser.add_argument('--N_workers', type=int, default=2)
parser.add_argument('--pin_memory', action='store_true', default=False)
options = parser.parse_args()

# Merge configs: defaults < config file < explicitly-typed CLI flags
from neuron_gan_tpu.configs import config

input_args = [arg[2:].split('=')[0] for arg in sys.argv
              if arg.startswith('--') and arg != '--configs']
if options.configs:
    overwritten = {arg: getattr(options, arg) for arg in input_args
                   if hasattr(options, arg)}
    config.import_configs(options.configs, overwritten_configs=overwritten)
else:
    for arg in input_args:
        if hasattr(options, arg):
            setattr(config, arg, getattr(options, arg))
    config.define_ID_dependent_configs()
    config.validate_configs()

import jax
import jax.numpy as jnp

import neuron_gan_tpu
neuron_gan_tpu.enable_compilation_cache()

from neuron_gan_tpu.checkpoint import (
    Checkpointer, import_reference_checkpoint, load_pytree_npz,
    merge_state_tolerant, report_merge)
from neuron_gan_tpu.data import NeuronDataset
from neuron_gan_tpu.models import (
    PGConfig, GrowthState, init_generator_pg, init_discriminator_pg,
    generator_pg, discriminator_pg)
from neuron_gan_tpu.parallel import make_mesh, shard_params, replicate
from neuron_gan_tpu.train_step import (
    ChunkSpec, make_epoch_runner, make_optimizer, init_train_state,
    STAT_NAMES)
from neuron_gan_tpu.utils import sample_latent_vec, validated_input
from neuron_gan_tpu.utils.crashdump import save_vars
from neuron_gan_tpu.utils.monitor import calculate_d_steps
from neuron_gan_tpu.utils.plotting import (
    gen_samples, plot_gen_samples, plot_scores, plot_grad_norm, plot_swd)

config.print_configs()

# ---------------------------------------------------------------- ID check
if not config.resume:
    existent = [f for f in os.listdir(config.weights_dir)
                if f.endswith(('.pth', '.npz'))]
    ids_existent = set()
    for f in existent:
        # Also match the Checkpointer's immutable snapshot files
        # (e.g. GenDisc_ab12_1k.npz), so an ID whose rolling file was
        # deleted still registers as taken.
        m = re.match(r'(?P<prefix>[^_]+)_(?P<ID>[^_.]+?)(?:_\d+k)?\.(pth|npz)$', f)
        if m:
            ids_existent.add(m.group('ID'))
    if config.ID in ids_existent:
        ans = validated_input('ID={} already exists. Use a new ID(y/n)?'.format(config.ID),
                              lambda x: x in ['y', 'n'], default='n')
        if ans == 'y':
            config.ID = validated_input('Type a new ID:',
                                        lambda x: x not in ids_existent,
                                        'ID already exists.')
            config.define_ID_dependent_configs()

# ---------------------------------------------------------------- dataset
dataset = NeuronDataset(directory=config.dataset_dir,
                        image_size=config.image_size,
                        augmentations=True,
                        im_translation=config.translation,
                        seed=config.seed,
                        preload_limit_mb=config.dataset_preload_limit_mb)
N_real_images = len(dataset)

mesh = make_mesh(config.mesh_shape)

# ---------------------------------------------------------------- networks
if config.wgan:
    from legacy_train import wgan_train
    wgan_train(config, dataset, mesh)
    sys.exit(0)
elif not config.pggan:
    raise Exception('dcgan training is not implemented with new configs')

N_upsamples = len(config.N_gen_features) - 1
image_size_initial = dataset.image_size_max // (2 ** N_upsamples)

model_cfg = PGConfig(
    n_gen_features=tuple(config.N_gen_features),
    n_dis_features=tuple(config.N_dis_features),
    latent_dim=config.latent_dim,
    image_size_init=image_size_initial,
    n_colors=config.N_colors,
    neg_slope=config.LeakyReLU_leak,
    compute_dtype=config.compute_dtype,
    precision=(None if config.matmul_precision == 'default'
               else config.matmul_precision),
    packed_min_res=config.packed_min_res,
    packed_lanes=config.packed_lanes,
    use_pallas=config.use_pallas,
    # opaque custom calls do not partition under auto-SPMD: keep the einsum
    # epilogue whenever a multi-device mesh is active
    pallas_epilogue=(False if mesh is not None else config.pallas_epilogue),
)

key = jax.random.PRNGKey(config.seed)
key, kg, kd = jax.random.split(key, 3)
g_params = init_generator_pg(kg, model_cfg)
d_params = init_discriminator_pg(kd, model_cfg)
opt = make_optimizer(config.beta1, config.RMSprop)
state = init_train_state(g_params, d_params, opt, ema_beta=config.ema_beta)
growth = GrowthState(model_cfg)

print('Generator params: {:,}'.format(
    sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(g_params))))
print('Discriminator params: {:,}'.format(
    sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(d_params))))

# ------------------------------------------------------- checkpoint/resume
train_state_filename = os.path.join(
    config.weights_dir, FILENAME_FORMAT.format(prefix='GenDisc', ID=config.ID,
                                               ext='npz'))
checkpoint = Checkpointer(train_state_filename, n_epochs=config.N_epochs,
                          extra_checkpoint_period=1e3)

if config.resume and not os.path.exists(train_state_filename):
    # Same fall-through as the reference's first session (train.py:201-203),
    # but say so: a deleted/renamed rolling file would otherwise silently
    # restart a run the user believes is resuming.
    print('resume: no checkpoint at {} — starting a fresh run'.format(
        train_state_filename))
if config.resume and os.path.exists(train_state_filename):
    tree, meta = checkpoint.load_state()
    # Tolerant restore (reference loads weights strict=False,
    # utils.py:213-218): leaves matching the fresh state's structure+shape
    # are restored; anything else keeps its initialized value, reported.
    state, merge_report = merge_state_tolerant(state, tree)
    report_merge(merge_report, where='resume')
    # A checkpoint written without EMA must seed the shadow from the
    # *restored* generator, not the fresh init the merge kept.
    if config.ema_beta > 0 and any(p.startswith('state.g_ema')
                                   for p in merge_report['missing']):
        state['g_ema'] = jax.tree.map(jnp.asarray, state['g_params'])
    growth = GrowthState(model_cfg)
    if meta['image_size'] > model_cfg.image_size_init or meta['alpha'] < 1.0:
        growth.set_resolution(int(meta['image_size']), float(meta['alpha']))
elif config.weights_init:
    wpath = os.path.join(config.weights_dir, config.weights_init)
    if wpath.endswith('.pth'):
        g_imp, d_imp, cfg_imp, growth, _ = import_reference_checkpoint(wpath)
        assert cfg_imp.n_gen_features == model_cfg.n_gen_features, \
            'weights_init architecture mismatch'
        g_params = jax.tree.map(jnp.asarray, g_imp)
        d_params = jax.tree.map(jnp.asarray, d_imp)
        state = init_train_state(g_params, d_params, opt)
        print('Loaded weights from {}'.format(wpath))
    else:
        tree, meta = load_pytree_npz(wpath)
        loaded = tree if 'g_params' in tree else tree['state']
        state, merge_report = merge_state_tolerant(state, loaded)
        report_merge(merge_report, where='weights_init')
        if meta and 'image_size' in meta:
            growth = GrowthState(model_cfg)
            if meta['image_size'] > model_cfg.image_size_init or meta['alpha'] < 1.0:
                growth.set_resolution(int(meta['image_size']), float(meta['alpha']))
        print('Loaded weights from {}'.format(wpath))

if config.ema_beta > 0 and 'g_ema' not in state:
    state['g_ema'] = jax.tree.map(jnp.asarray, state['g_params'])

if mesh is not None:
    state = {k: shard_params(v, mesh) for k, v in state.items()}

dataset.set_image_size(growth.image_size)

# HBM-resident dataset stack — or host-resident streaming when the raw stack
# would exceed the device budget (neuron_gan_tpu/streaming.py; the reference
# handles oversize datasets by re-reading items from disk per access,
# NeuronDataset.py:128-146)
_stack_bytes = len(dataset) * dataset.padded_size ** 2 * 4
streaming_stack = bool(config.hbm_budget_mb) and \
    _stack_bytes > config.hbm_budget_mb * 2 ** 20
if streaming_stack:
    print('dataset stack {:.0f} MB exceeds hbm_budget_mb={} — streaming from '
          'host per epoch'.format(_stack_bytes / 2 ** 20, config.hbm_budget_mb))
    # bounded device-resident sample: checkpoint artifacts + SWD real set
    images_stack = jnp.asarray(np.ascontiguousarray(dataset.images[:64]))
else:
    images_stack = jnp.asarray(dataset.images)
if mesh is not None:
    images_stack = replicate(images_stack, mesh)

# ---------------------------------------------------------------- schedule
from neuron_gan_tpu.schedule import TrainSchedule

sched = TrainSchedule(transit_sch=tuple(config.transit_sch),
                      alpha_step=config.alpha_step,
                      n_epochs=config.N_epochs,
                      checkpointing_period=config.checkpointing_period,
                      lr0=config.learning_rate)
lr_at = sched.lr_at
Disc_adapt_update_period = 100
Monitoring_period = 10

epoch_init = checkpoint.epoch + 1
# the lr is a pure function of epoch, so resume correctness never depends on
# the saved value — but a mismatch means the checkpoint was written under a
# different schedule (or by a pre-round-3 build that recorded the initial lr)
if config.resume and checkpoint.epoch > 0 and 'meta' in dir():
    saved_lr = meta.get('lr') if isinstance(meta, dict) else None
    if saved_lr is not None and not np.isclose(
            float(saved_lr), sched.lr_at(checkpoint.epoch), rtol=1e-5):
        print('resume: checkpoint meta lr {:.6g} != schedule lr {:.6g} at '
              'epoch {} — resuming with the schedule value'.format(
                  float(saved_lr), sched.lr_at(checkpoint.epoch),
                  checkpoint.epoch))
if config.N_epochs_session:
    # clamp: the schedule (and the checkpoint's loss series) end at
    # N_epochs; a session must not train past it
    epoch_final = min(epoch_init + config.N_epochs_session,
                      config.N_epochs + 1)
else:
    epoch_final = config.N_epochs + 1


def phase_at_epoch(e):
    return sched.phase_at(e)


def fading_at_epoch(e):
    return sched.fading_at(e)


def growth_at_epoch(e):
    return GrowthState(model_cfg, phase=sched.phase_at(e),
                       alpha=sched.alpha_at(e))


def next_chunk_end(e):
    # adapt_critic recomputes N_D once per window-aligned chunk (period =
    # the reference's 100-epoch lookback window) rather than per epoch —
    # same information horizon, chunked-dispatch speed.
    return sched.chunk_end(
        e, epoch_final,
        adapt_period=(Disc_adapt_update_period if config.adapt_critic else None))


def make_spec(e, n_critic):
    phase = sched.phase_at(e)
    fading, t0 = sched.fading_at(e)
    lrp = sched.lr_phase_of_chunk(e)
    return ChunkSpec(
        phase=phase, fading=fading, n_critic=n_critic,
        batch_size=config.batch_size, n_images=N_real_images,
        shuffle=(config.image_preprocessing != 'device'),
        crop_size=dataset.image_size_max, translation=config.translation,
        augment=dataset.augmentations,
        fast_augment=bool(config.fast_augment),
        shear_warp=(config.shear_warp if config.shear_warp == 'auto'
                    else bool(config.shear_warp)),
        gp_reuse_fakes=bool(config.gp_reuse_fakes),
        gp_lambda=float(config.grad_pen_lambda),
        drift_epsilon=float(config.drift_epsilon),
        sim_lambda0=float(config.sim_loss_lambda),
        sim_decay=float(config.sim_loss_lambda_decay_rate),
        beta1=float(config.beta1), rmsprop=bool(config.RMSprop),
        lr0=float(config.learning_rate), lr_gamma=float(sched.gammas[lrp]),
        lr_boundary=int(sched.boundaries[lrp]),
        lr_cap=int(sched.phase_lens[lrp] // 2),
        lr_prev_final=float(sched.lr_at(e)),
        alpha_start=t0, alpha_step=float(config.alpha_step),
        latent_dim=config.latent_dim,
        data_axis=('data' if mesh is not None else None),
        ema_beta=float(config.ema_beta),
    )


# ---------------------------------------------------------------- plots etc.
training_summary_filename = os.path.join(
    config.plots_dir, 'Training_summary_{}.png'.format(config.ID))


def checkpoint_artifacts(epoch, state, growth):
    fake_samples_filepath = os.path.join(
        config.samples_sub_dir, 'Samples_{}_{:d}.png'.format(config.ID, epoch))
    plot_gen_samples(state['g_params'], model_cfg, growth, n_images=16, seed=0,
                     filename=fake_samples_filepath)
    plot_scores(checkpoint.loss_real[:epoch], checkpoint.loss_fake[:epoch],
                training_summary_filename)
    # Fresh gradient histograms (functional equivalent of the reference's
    # leftover .grad plots, train.py:450-451)
    try:
        from neuron_gan_tpu.losses import d_w_loss, g_w_loss
        alpha = growth.alpha if growth.fading else None
        g_apply = lambda p, z: generator_pg(p, z, model_cfg, growth.phase, alpha)
        d_apply = lambda p, x: discriminator_pg(p, x, model_cfg, growth.phase, alpha)
        res = growth.image_size
        kb = jax.random.PRNGKey(epoch)
        from neuron_gan_tpu.data.augment import AugmentSpec, augment_batch
        spec = AugmentSpec(crop_size=dataset.image_size_max, out_size=res,
                           translation=config.translation, augment=True)
        batch = augment_batch(images_stack[:config.batch_size], kb, spec)
        z = sample_latent_vec(kb, (config.batch_size, config.latent_dim))
        d_grads = jax.grad(lambda dp: d_w_loss(d_apply, g_apply, dp,
                                               state['g_params'], batch, z,
                                               config.drift_epsilon)[0])(state['d_params'])
        g_grads = jax.grad(lambda gp: g_w_loss(g_apply, d_apply, gp,
                                               state['d_params'], z)[0])(state['g_params'])
        grad_norm_filename = os.path.join(
            config.plots_dir, 'Gradient_norms_{}.png'.format(config.ID))
        plot_grad_norm(g_grads, d_grads, grad_norm_filename)
    except Exception as exc:  # plots must never kill training
        print(f'grad-norm plot skipped: {exc}')


# Training-time sample-quality monitor (beyond-reference addition): every
# config.swd_period epochs, score 64 seeded samples at the NATIVE training
# resolution against the real set with multi-scale sliced Wasserstein
# distance (the PGGAN paper's metric; same scoring conventions as
# `eval.py -swd`), append to a resume-safe JSONL series, and refresh the
# quality curve PNG.
swd_log_filepath = os.path.join(
    config.logs_dir, 'SWD_{}.jsonl'.format(config.ID))
swd_plot_filepath = os.path.join(
    config.plots_dir, 'SWD_{}.png'.format(config.ID))
swd_records = []
if config.swd_period > 0:
    if config.resume and os.path.exists(swd_log_filepath):
        with open(swd_log_filepath) as fh:
            swd_records = [json.loads(line) for line in fh if line.strip()]
        # a resumed run re-trains epochs after the checkpoint; drop (and
        # rewrite the series without) their now-stale scores
        swd_records = [r for r in swd_records if r['epoch'] <= checkpoint.epoch]
    with open(swd_log_filepath, 'w') as fh:
        for r in swd_records:
            fh.write(json.dumps(r) + '\n')


def swd_monitor(epoch, state, growth):
    from neuron_gan_tpu.data.augment import AugmentSpec, augment_batch
    from neuron_gan_tpu.metrics import swd_multiscale

    res = int(growth.image_size)
    fake, _ = gen_samples(state['g_params'], model_cfg, growth,
                          n_images=64, seed=0)
    spec = AugmentSpec(crop_size=dataset.image_size_max, out_size=res,
                       translation=0.0, augment=False)
    real = np.asarray(augment_batch(images_stack, jax.random.PRNGKey(0), spec))
    levels, mean = swd_multiscale(real, np.asarray(fake),
                                  jax.random.PRNGKey(123),
                                  n_patches=2048, n_repeats=4)
    rec = {'epoch': int(epoch), 'swd_mean': round(float(mean), 4),
           'levels': [round(float(v), 4) for v in levels],
           'resolution': res,
           'alpha': round(float(min(growth.alpha, 1.0)), 4)}
    swd_records.append(rec)
    with open(swd_log_filepath, 'a') as fh:
        fh.write(json.dumps(rec) + '\n')
    plot_swd(swd_records, swd_plot_filepath)
    print('SWD at epoch {}: mean {:.4f} (finest {:.4f}, {}x{})'.format(
        epoch, mean, levels[0], res, res))


def save_checkpoint(epoch, state, growth):
    meta = {
        # the lr in effect at the checkpointed epoch (the reference saves the
        # current decayed lr, utils.py:166) — not the initial learning_rate
        'lr': float(lr_at(epoch)),
        'image_size': growth.image_size,
        'alpha': float(min(growth.alpha, 1.0)),
        'phase': growth.phase,
        'ID': config.ID,
        'N_gen_features': list(config.N_gen_features),
        'N_dis_features': list(config.N_dis_features),
        'latent_dim': config.latent_dim,
        'image_size_init': model_cfg.image_size_init,
        # architecture knobs eval.py must reproduce exactly (a missing
        # neg_slope would silently rebuild with the wrong activation)
        'N_colors': model_cfg.n_colors,
        'LeakyReLU_leak': model_cfg.neg_slope,
    }
    host_state = jax.tree.map(np.asarray, state)
    checkpoint.save_state(epoch, host_state, meta)


# ---------------------------------------------------------------- training
def pggan_train():
    global state, growth
    start_time = time.time()
    monitored = OrderedDict()
    epoch = epoch_init
    pggan_train.profiled = False
    n_critic = config.n_critic
    run_key = jax.random.PRNGKey(config.seed + 977)

    while epoch < epoch_final:
        growth = growth_at_epoch(epoch)
        dataset.set_image_size(growth.image_size)

        # Gate on the populated loss-series length (entries exist for epochs
        # 1..epoch-1), matching reference train.py:336 which gates on
        # len(Score_real_series) > Disc_adapt_update_period.
        if config.adapt_critic and (epoch - 1) > Disc_adapt_update_period:
            n_critic = calculate_d_steps(
                checkpoint.loss_real[:epoch - 1],
                checkpoint.loss_fake[:epoch - 1],
                0, config.n_critic, Disc_adapt_update_period)
        else:
            n_critic = config.n_critic

        chunk_end = next_chunk_end(epoch)
        n_epochs_chunk = chunk_end - epoch + 1
        spec = make_spec(epoch, n_critic)
        # optional one-shot device trace of a steady-state chunk
        profile_this = bool(config.profile_dir) and epoch > epoch_init \
            and not pggan_train.profiled
        if profile_this:
            jax.profiler.start_trace(config.profile_dir)
        if streaming_stack:
            from neuron_gan_tpu.streaming import (
                run_epochs_streaming, group_batches_for_budget)
            from jax.sharding import NamedSharding, PartitionSpec as P
            max_group = group_batches_for_budget(
                spec, dataset.padded_size, config.hbm_budget_mb * 2 ** 20)
            state, stats = run_epochs_streaming(
                model_cfg, spec, state, dataset.images, run_key, epoch,
                n_epochs_chunk, max_group,
                sharding=(NamedSharding(mesh, P()) if mesh is not None
                          else None))
        else:
            runner = make_epoch_runner(model_cfg, spec, n_epochs_chunk,
                                       donate=config.donate_state)
            state, stats = runner(state, images_stack, run_key, epoch)
        stats = np.asarray(jax.device_get(stats))  # (n, 6)
        if profile_this:
            jax.profiler.stop_trace()
            pggan_train.profiled = True
            print(f'Profiler trace written to {config.profile_dir}')

        # NaN guard (reference loss_functions.py:35-41 — host-side here)
        if not np.isfinite(stats).all():
            save_vars({'stats': stats, 'epoch': epoch,
                       'spec': str(spec)})
            bad = np.argwhere(~np.isfinite(stats))
            raise ValueError(f'NaN/Inf in training stats at chunk epoch '
                             f'{epoch + int(bad[0][0])}: '
                             f'{STAT_NAMES[int(bad[0][1])]}')

        # series + monitoring
        for i in range(n_epochs_chunk):
            e = epoch + i
            checkpoint.loss_real[e - 1] = stats[i, 0]
            checkpoint.loss_fake[e - 1] = stats[i, 1]
            checkpoint.loss_d[e - 1] = stats[i, 2]
            checkpoint.loss_g[e - 1] = stats[i, 3]
            if e % Monitoring_period == 0:
                fading_e, t0e = fading_at_epoch(e)
                alpha_e = min((e - t0e) * config.alpha_step, 1.0) if fading_e else 1.0
                res_e = model_cfg.resolution(phase_at_epoch(e))
                monitored['Epoch'] = '{}'.format(e)
                n_completed = e - epoch_init
                monitored['time(s)/iter'] = ('{:.1f}'.format(
                    (time.time() - start_time) / n_completed)
                    if n_completed > 0 else '----')
                monitored['lr'] = '{:.4g}'.format(lr_at(e))
                if config.adapt_critic:
                    monitored['N_D_steps'] = '{}'.format(n_critic)
                monitored['alpha'] = '{: >5.3f}'.format(alpha_e)
                monitored['Res'] = '{}x{}'.format(res_e, res_e)
                monitored['Loss_real (<D(x)>_x)'] = '{: >#7.4g}'.format(stats[i, 0])
                monitored['Loss_fake (<D(G(z))>)'] = '{: >#7.4g}'.format(stats[i, 1])
                monitored['G_loss'] = '{: >#7.4g}'.format(stats[i, 3])
                monitored['D_loss'] = '{: >#7.4g}'.format(stats[i, 2])
                if stats[i, 4] != 0:
                    monitored['D_grad_pen'] = '{: >#7.4g}'.format(stats[i, 4])
                else:  # don't let a stale value keep printing once it hits 0
                    monitored.pop('D_grad_pen', None)
                if stats[i, 5] != 0:
                    monitored['G_sim_loss'] = '{: >#7.4g}'.format(stats[i, 5])
                else:
                    monitored.pop('G_sim_loss', None)
                print(', '.join(s + ':' + v for s, v in monitored.items()))

        chunk_start = epoch
        epoch = chunk_end + 1
        # save on the period, and also at session end so trailing epochs of
        # a non-period-aligned run are never trained-then-discarded (the
        # reference only saves on the period, train.py:435 — an extra final
        # save is strictly better)
        if (chunk_end % config.checkpointing_period == 0
                or chunk_end == epoch_final - 1):
            growth_end = growth_at_epoch(chunk_end)
            save_checkpoint(chunk_end, state, growth_end)
            checkpoint_artifacts(chunk_end, state, growth_end)
        # quality monitor: fire when this chunk crossed a multiple of
        # swd_period (chunks need not land exactly on multiples)
        if config.swd_period > 0 and (
                chunk_end // config.swd_period
                > (chunk_start - 1) // config.swd_period):
            try:
                swd_monitor(chunk_end, state, growth_at_epoch(chunk_end))
            except Exception as exc:  # monitoring must never kill training
                print(f'SWD monitor skipped: {exc}')


if __name__ == '__main__':
    if mesh is not None:
        with jax.sharding.set_mesh(mesh):
            pggan_train()
    else:
        pggan_train()

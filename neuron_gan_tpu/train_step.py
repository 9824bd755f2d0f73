"""Jitted training: one XLA executable per (phase, fading?, n_critic) tuple.

The reference's hot loop (train.py:350-394) runs, per batch: N_D critic
updates — each a critic Wasserstein loss + gradient penalty + Adam step —
then one generator update; epochs iterate batches of the (tiny) dataset.
Here the *entire epoch chunk* is one jitted function:

  run_epochs(state, images_stack, key, first_epoch)
    -> lax.scan over epochs
         -> per epoch: permutation (shuffle), lr(epoch), alpha(epoch),
            sim-lambda(epoch) computed in-graph (traced scalars — fade-in and
            LR decay cause ZERO recompiles)
         -> lax.scan over batches
              -> on-device augmentation of the HBM-resident stack
              -> n_critic critic updates (statically unrolled; fresh latents
                 and GP interpolation draws per update, matching
                 loss_functions.py:25/:166-170)
              -> one generator update
    -> stacked per-epoch stats (score_real/fake, D/G loss, grad-pen, sim)

Chunks are cut by the host driver at phase transitions, fade-in completion,
and checkpoint boundaries, so every static parameter (phase, fading,
n_critic, batch geometry) is constant within a chunk.

Optimizers replicate torch semantics: Adam(beta1, 0.999, eps=1e-8) with
bias correction and eps *outside* the sqrt (train.py:224-225), or RMSprop
(alpha=0.99, eps outside sqrt) when config.RMSprop (train.py:221-222).

LR schedule replicates train.py:250-265: reset to lr0 at each phase
boundary, exponential decay by x(1/100) over the first half of the phase,
flat thereafter.  (Divergence note: on resume past a phase's half-way point
the reference would run at full lr0 until the next boundary because
update_lr only ever *lowers* lr inside the first half — we implement the
intended schedule, a pure function of epoch.)

Multi-chip: pass a jax.sharding.Mesh + axis names; the batch is annotated
with a 'data'-axis sharding constraint after augmentation, and parameters
may be laid out with model-axis sharding by the caller (parallel/mesh.py).
XLA inserts the gradient psums over ICI.
"""

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuron_gan_tpu.data.augment import AugmentSpec, augment_batch
from neuron_gan_tpu.losses import (
    d_grad_pen_loss, d_w_loss, g_w_loss, similarity_loss,
)
from neuron_gan_tpu.models import PGConfig, discriminator_pg, generator_pg
from neuron_gan_tpu.utils.latents import sample_latent_vec


# --------------------------------------------------------------------------
# Optimizers (torch-semantics)
# --------------------------------------------------------------------------

def _scale_by_rms_torch(decay=0.99, eps=1e-8):
    """torch.optim.RMSprop update: g / (sqrt(v) + eps), v EMA with `decay`."""

    def init_fn(params):
        return {'nu': jax.tree.map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        nu = jax.tree.map(lambda n, g: decay * n + (1 - decay) * g * g,
                          state['nu'], updates)
        upd = jax.tree.map(lambda g, n: g / (jnp.sqrt(n) + eps), updates, nu)
        return upd, {'nu': nu}

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(beta1=0.5, rmsprop=False):
    """LR-less transform; the (per-epoch traced) lr is applied at use."""
    if rmsprop:
        return _scale_by_rms_torch(decay=0.99, eps=1e-8)
    return optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)


def init_train_state(g_params, d_params, opt, ema_beta=0.0):
    state = {
        'g_params': g_params,
        'd_params': d_params,
        'g_opt': opt.init(g_params),
        'd_opt': opt.init(d_params),
    }
    if ema_beta > 0:
        state['g_ema'] = jax.tree.map(jnp.array, g_params)
    return state


def _apply_update(params, opt_state, grads, opt, lr):
    updates, new_opt_state = opt.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return new_params, new_opt_state


# Host-side schedule mirrors live in schedule.py (TrainSchedule.alpha_at,
# schedule.sim_lambda_at); the traced copies inside epoch_body below are
# property-tested against them (tests/test_train_step.py).

# --------------------------------------------------------------------------
# Epoch-chunk runner factory
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ChunkSpec:
    """Everything static for one jitted epoch chunk."""
    phase: int
    fading: bool
    n_critic: int
    batch_size: int
    n_images: int
    shuffle: bool
    crop_size: int            # dataset max resolution (CenterCrop target)
    translation: float
    augment: bool
    gp_lambda: float
    drift_epsilon: float
    sim_lambda0: float
    sim_decay: float
    beta1: float
    rmsprop: bool
    lr0: float
    lr_gamma: float           # per-phase decay factor
    lr_boundary: int          # epoch where this phase began
    lr_cap: int               # floor(phase_len / 2)
    alpha_start: int          # transition start epoch (fading chunks)
    alpha_step: float
    latent_dim: int
    data_axis: Optional[str] = None   # mesh axis name for batch sharding
    # lr while training the transition epoch itself (= previous phase's final
    # lr; the reference resets only from the following epoch, train.py:252)
    lr_prev_final: float = -1.0
    # EMA decay for a shadow generator (stretch feature, BASELINE.json
    # config 5; 0 disables — the train state then has no 'g_ema' entry)
    ema_beta: float = 0.0
    # Run the augmentation warp at phase scale (AugmentSpec.fast) —
    # config.fast_augment
    fast_augment: bool = False
    # Augmentation warp backend (only affects the fast_augment path;
    # config.shear_warp).  True = 3-pass integer-shift shear rotation
    # (quarter turns exact; ~2x faster warp on TPU at most phases but a
    # slightly different nearest-sampling distribution — 6-seed SWD-gated,
    # BASELINE.md); False = torchvision-exact point-gather warp; 'auto' =
    # pick the measured-faster backend per phase resolution (resolve_shear).
    shear_warp: object = False
    # Reuse the critic-loss fake batch (z1) for the gradient-penalty
    # interpolates instead of drawing a fresh z2 — the original WGAN-GP
    # formulation (Gulrajani et al. penalize the same fake minibatch); the
    # reference draws fresh latents per loss (loss_functions.py:166).  XLA
    # CSE then computes G(z1) once, saving a full generator forward per
    # critic step.  config.gp_reuse_fakes
    gp_reuse_fakes: bool = False
    # Rematerialize the discriminator forward inside the gradient-penalty
    # inner grad (jax.checkpoint): the GP double-backward then recomputes
    # D(x_hat)'s activations during the outer backward instead of keeping
    # them live across the whole critic step — trades conv FLOPs for saved-
    # activation HBM traffic (the double-bwd conv pieces are ~4.9 ms/step,
    # BASELINE.md round-3 op trace).  Float-identical math (remat replays
    # the same ops), so no quality gate applies.
    gp_remat: bool = False

    @property
    def n_full_batches(self):
        return self.n_images // self.batch_size

    @property
    def batch_remainder(self):
        """Size of the final partial batch (reference DataLoader semantics:
        drop_last=False keeps it, weighted by its true size —
        reference train.py:149-155, :388-394)."""
        return self.n_images % self.batch_size


def _traced_lr(spec: ChunkSpec, epoch):
    """In-graph mirror of schedule.TrainSchedule.lr_at for one (static) phase
    (the host arithmetic lives there; the spec carries its per-phase
    gamma/boundary/cap so no recompile is needed as lr decays)."""
    e = epoch - 1
    e_since = e - spec.lr_boundary
    steps = jnp.clip(e_since, 0, spec.lr_cap).astype(jnp.float32)
    lr = spec.lr0 * jnp.power(jnp.float32(spec.lr_gamma), steps)
    # e_since < 0 happens only at the transition epoch itself, which still
    # runs at the previous phase's final lr (reset applies from the next one).
    prev = spec.lr_prev_final if spec.lr_prev_final >= 0 else spec.lr0
    return jnp.where(e_since < 0, jnp.float32(prev), lr)


def epoch_scalars(spec: ChunkSpec, epoch):
    """The traced per-epoch scalars (alpha, lr, sim_lambda) — shared between
    the in-graph epoch scan and the host-driven streaming runner
    (streaming.py) so both paths compute bit-identical schedules."""
    lr = _traced_lr(spec, epoch)
    if spec.fading:
        alpha = jnp.clip((epoch - spec.alpha_start) * spec.alpha_step,
                         0.0, 1.0).astype(jnp.float32)
    else:
        alpha = jnp.float32(1.0)
    if spec.sim_lambda0 > 0 and spec.sim_decay > 0:
        lam = spec.sim_lambda0 * jnp.power(
            1.0 - spec.sim_decay,
            (jnp.asarray(epoch) - 1).astype(jnp.float32))
        lam = jnp.where(lam > 1e-5, lam, 0.0)
    else:
        lam = jnp.float32(spec.sim_lambda0)
    return alpha, lr, lam


def resolve_shear(shear_warp, out_size):
    """Resolve the warp backend for one phase: bool forces it; 'auto' picks
    the measured-faster backend per phase resolution.  The per-phase
    steady-state study (BASELINE.md shear section) has shear ahead at every
    phase EXCEPT 32² (424→304 steps/s — the shear canvas/stage overhead
    dominates the tiny warp there, while the gather's point count is still
    small): 16² 540→581, 64² 182→239, 128² 82→90, 256² 36.5→41.7,
    512² 9.97→11.43.  Both backends passed the same 6-seed SWD quality bar,
    so mixing them across phases changes no gated semantics."""
    if isinstance(shear_warp, bool):
        return shear_warp
    if shear_warp == 'auto':
        return out_size != 32
    raise ValueError(f'shear_warp must be True, False or "auto"; '
                     f'got {shear_warp!r}')


def make_batch_step(cfg: PGConfig, spec: ChunkSpec):
    """Build ``batch_body(state, (raw_batch, k_batch), alpha, lr, sim_lam)``
    — one full G+D update on one raw (unaugmented) batch.  Shared between
    make_epoch_runner's in-graph epoch scan and the streaming group runner
    (streaming.py), so the two paths are the same compiled math."""
    out_size = cfg.resolution(spec.phase)
    aug_spec = AugmentSpec(crop_size=spec.crop_size, out_size=out_size,
                           translation=spec.translation, augment=spec.augment,
                           fast=spec.fast_augment,
                           shear=(resolve_shear(spec.shear_warp, out_size)
                                  and spec.fast_augment))
    opt = make_optimizer(spec.beta1, spec.rmsprop)

    def g_apply_with(alpha):
        a = alpha if spec.fading else None
        return lambda p, z: generator_pg(p, z, cfg, spec.phase, a)

    def d_apply_with(alpha):
        a = alpha if spec.fading else None
        return lambda p, x: discriminator_pg(p, x, cfg, spec.phase, a)

    def shard_batch(x):
        if spec.data_axis is None:
            return x
        from jax.sharding import PartitionSpec as P
        ndim = x.ndim
        return jax.lax.with_sharding_constraint(
            x, P(spec.data_axis, *([None] * (ndim - 1))))

    def batch_body(state, inp, alpha, lr, sim_lam):
        raw_batch, k_batch = inp
        b = raw_batch.shape[0]  # static; = batch_size except the last partial batch
        g_apply = g_apply_with(alpha)
        d_apply = d_apply_with(alpha)

        images = augment_batch(raw_batch, jax.random.fold_in(k_batch, 0), aug_spec)
        images = shard_batch(images)

        g_params, d_params = state['g_params'], state['d_params']
        g_opt, d_opt = state['g_opt'], state['d_opt']

        def d_total_loss(d_params_, z1, z2, eps):
            loss_w, (sr, sf) = d_w_loss(d_apply, g_apply, d_params_, g_params,
                                        images, z1, spec.drift_epsilon)
            if spec.gp_lambda > 0:
                fake = jax.lax.stop_gradient(g_apply(g_params, z2))
                gp = d_grad_pen_loss(d_apply, d_params_, images, fake, eps,
                                     spec.gp_lambda, remat=spec.gp_remat)
            else:
                gp = jnp.zeros((), images.dtype)
            return loss_w + gp, (sr, sf, gp)

        sr = sf = gp = d_loss_val = jnp.zeros((), images.dtype)
        for j in range(spec.n_critic):
            kj = jax.random.fold_in(k_batch, 1 + j)
            z1 = sample_latent_vec(jax.random.fold_in(kj, 0), (b, spec.latent_dim))
            z2 = z1 if spec.gp_reuse_fakes else sample_latent_vec(
                jax.random.fold_in(kj, 1), (b, spec.latent_dim))
            eps = jax.random.uniform(jax.random.fold_in(kj, 2), (b,))
            (d_loss_val, (sr, sf, gp)), d_grads = jax.value_and_grad(
                d_total_loss, has_aux=True)(d_params, z1, z2, eps)
            d_params, d_opt = _apply_update(d_params, d_opt, d_grads, opt, lr)

        if spec.n_critic == 0:
            # loss computed for monitoring only (train.py:369-372)
            kj = jax.random.fold_in(k_batch, 1)
            z1 = sample_latent_vec(jax.random.fold_in(kj, 0), (b, spec.latent_dim))
            z2 = z1 if spec.gp_reuse_fakes else sample_latent_vec(
                jax.random.fold_in(kj, 1), (b, spec.latent_dim))
            eps = jax.random.uniform(jax.random.fold_in(kj, 2), (b,))
            d_loss_val, (sr, sf, gp) = d_total_loss(d_params, z1, z2, eps)

        # Generator update
        kg = jax.random.fold_in(k_batch, 101)
        zg = sample_latent_vec(kg, (b, spec.latent_dim))

        def g_total_loss(g_params_):
            loss, z = g_w_loss(g_apply, d_apply, g_params_, d_params, zg)
            if spec.sim_lambda0 > 0:
                s = similarity_loss(images, z, 1.0) * sim_lam
                return loss + s, s
            return loss, jnp.zeros((), images.dtype)

        (g_loss_val, g_sim), g_grads = jax.value_and_grad(
            g_total_loss, has_aux=True)(g_params)
        g_params, g_opt = _apply_update(g_params, g_opt, g_grads, opt, lr)

        new_state = {'g_params': g_params, 'd_params': d_params,
                     'g_opt': g_opt, 'd_opt': d_opt}
        if spec.ema_beta > 0:
            beta = jnp.float32(spec.ema_beta)
            new_state['g_ema'] = jax.tree.map(
                lambda e, p: beta * e + (1.0 - beta) * p,
                state['g_ema'], g_params)
        # weight per-batch stats by the true batch size (reference
        # train.py:388-394 weights epoch stats by batch_size_curr)
        stats = jnp.stack([sr, sf, d_loss_val, g_loss_val, gp, g_sim]) * b
        return new_state, stats

    return batch_body


@functools.lru_cache(maxsize=None)
def make_epoch_runner(cfg: PGConfig, spec: ChunkSpec, n_epochs: int,
                      donate: bool = True, unroll: int = 1):
    """Build the jitted chunk runner for (cfg, spec, n_epochs).

    ``unroll`` unrolls the per-epoch batch scan (lax.scan ``unroll=``) —
    float-equivalent up to XLA reassociation noise across unrolled
    iterations (~1e-7; see tests/test_train_step.py), so keep unroll=1 on
    parity-sensitive paths.  At the flagship geometry (2 batches/epoch) the
    op trace attributes ~3 ms/step (~7%) to ``while`` bookkeeping + IDLE
    gaps, which unrolling targets.
    """
    batch_body = make_batch_step(cfg, spec)

    def epoch_body(state, epoch, key, images_stack):
        k_epoch = jax.random.fold_in(key, epoch)
        alpha, lr, lam = epoch_scalars(spec, epoch)

        if spec.shuffle:
            perm = jax.random.permutation(jax.random.fold_in(k_epoch, 7),
                                          spec.n_images)
            shuffled = jnp.take(images_stack, perm, axis=0)
        else:
            # sequential order (image_preprocessing='device'): no gather —
            # an arange take would copy the whole stack every epoch
            shuffled = images_stack
        n_full, rem = spec.n_full_batches, spec.batch_remainder
        n_steps = n_full + (1 if rem else 0)
        batch_keys = jax.random.split(jax.random.fold_in(k_epoch, 11), n_steps)

        batches = shuffled[:n_full * spec.batch_size].reshape(
            n_full, spec.batch_size, *images_stack.shape[1:])
        state, stats = jax.lax.scan(
            lambda s, inp: batch_body(s, inp, alpha, lr, lam),
            state, (batches, batch_keys[:n_full]),
            unroll=max(1, min(unroll, n_full)))
        stats_total = jnp.sum(stats, axis=0)
        if rem:
            # final partial batch (its own static shape; one extra executable
            # region inside the same jitted chunk)
            state, rem_stats = batch_body(
                state, (shuffled[n_full * spec.batch_size:], batch_keys[n_full]),
                alpha, lr, lam)
            stats_total = stats_total + rem_stats
        epoch_stats = stats_total / spec.n_images
        return state, epoch_stats

    def run(state, images_stack, key, first_epoch):
        epochs = first_epoch + jnp.arange(n_epochs)
        # key and the (large) image stack are loop-invariant: close over them
        # rather than carrying them through the scan
        state, stats = jax.lax.scan(
            lambda s, e: epoch_body(s, e, key, images_stack), state, epochs)
        return state, stats

    donate_argnums = (0,) if donate else ()
    return jax.jit(run, donate_argnums=donate_argnums)


STAT_NAMES = ('score_real', 'score_fake', 'D_loss', 'G_loss', 'D_grad_pen',
              'G_sim_loss')

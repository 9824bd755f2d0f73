"""compute_dtype='mixed': bfloat16 activations through the conv blocks with
float32 kept at the numerically sensitive spots (latent stem, PixelNorm
statistics, to_rgb tanh image, critic head/score).

The round-1 A/B showed pure-bfloat16 training collapses (BASELINE.md); these
tests pin the mixed recipe's contract: images and scores leave the nets in
float32, forwards track the float32 model closely, and the full WGAN-GP
train step (incl. the GP double-backward) stays finite and learns.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuron_gan_tpu.models import (
    PGConfig, init_generator_pg, init_discriminator_pg,
    generator_pg, discriminator_pg,
)
from neuron_gan_tpu.ops import pixel_norm
from neuron_gan_tpu.ops.packed import packed_pixel_norm, space_to_depth
from neuron_gan_tpu.train_step import (
    ChunkSpec, make_epoch_runner, make_optimizer, init_train_state, STAT_NAMES,
)


F32 = PGConfig(n_gen_features=(16, 8, 8), n_dis_features=(8, 8, 16),
               latent_dim=12, image_size_init=4)
MIX = dataclasses.replace(F32, compute_dtype='mixed')


@pytest.fixture(scope='module')
def params():
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    return init_generator_pg(kg, F32), init_discriminator_pg(kd, F32)


def test_pixel_norm_f32_stats_close_to_f32():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16)) * 3.0
    ref = np.asarray(pixel_norm(x))
    out = np.asarray(pixel_norm(x.astype(jnp.bfloat16), f32_stats=True)
                     .astype(jnp.float32))
    # single bf16 rounding of the input + one of the output
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)
    # packed variant normalizes each parity group over original channels
    xp = space_to_depth(x)
    refp = np.asarray(packed_pixel_norm(xp))
    outp = np.asarray(packed_pixel_norm(xp.astype(jnp.bfloat16), f32_stats=True)
                      .astype(jnp.float32))
    np.testing.assert_allclose(outp, refp, atol=0.05, rtol=0.05)


@pytest.mark.parametrize('phase,alpha', [(0, None), (2, None), (2, 0.5)])
def test_generator_mixed_outputs_f32_and_tracks_f32(params, phase, alpha):
    g, _ = params
    z = jax.random.normal(jax.random.PRNGKey(2), (3, F32.latent_dim))
    ref = generator_pg(g, z, F32, phase, alpha)
    out = generator_pg(g, z, MIX, phase, alpha)
    assert out.dtype == jnp.float32  # the image leaves the net in f32
    assert out.shape == ref.shape
    err = np.abs(np.asarray(out) - np.asarray(ref))
    # tanh-bounded output; bf16 rounding accumulates ~eps (0.008) per conv
    assert err.max() < 0.15, err.max()
    assert err.mean() < 0.02, err.mean()


@pytest.mark.parametrize('phase,alpha', [(0, None), (2, None), (2, 0.5)])
def test_discriminator_mixed_scores_f32_and_track_f32(params, phase, alpha):
    _, d = params
    res = F32.resolution(phase)
    x = jax.random.uniform(jax.random.PRNGKey(3), (3, res, res, 1)) * 2 - 1
    ref = np.asarray(discriminator_pg(d, x, F32, phase, alpha))
    out = discriminator_pg(d, x, MIX, phase, alpha)
    assert out.dtype == jnp.float32  # full-precision critic scores
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(np.asarray(out) - ref).max() / scale < 0.05


def test_mixed_packed_layout_forward_tracks_f32():
    cfg32 = dataclasses.replace(F32, packed_min_res=8)
    cfgmx = dataclasses.replace(MIX, packed_min_res=8)
    g = init_generator_pg(jax.random.PRNGKey(4), cfg32)
    z = jax.random.normal(jax.random.PRNGKey(5), (2, cfg32.latent_dim))
    ref = np.asarray(generator_pg(g, z, cfg32, 2))
    out = np.asarray(generator_pg(g, z, cfgmx, 2))
    err = np.abs(out - ref)
    assert err.max() < 0.15 and err.mean() < 0.02


def test_mixed_train_step_learns_and_stays_finite():
    """Full WGAN-GP epoch runner (GP double-backward through the bf16 casts)
    under 'mixed': finite stats, f32 params, both nets update."""
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = init_generator_pg(kg, MIX)
    d = init_discriminator_pg(kd, MIX)
    state = init_train_state(g, d, make_optimizer())
    spec = ChunkSpec(phase=1, fading=True, n_critic=1, batch_size=2,
                     n_images=4, shuffle=True, crop_size=16, translation=0.05,
                     augment=True, gp_lambda=10.0, drift_epsilon=0.001,
                     sim_lambda0=0.0, sim_decay=0.0, beta1=0.5, rmsprop=False,
                     lr0=1e-3, lr_gamma=0.99, lr_boundary=0, lr_cap=50,
                     alpha_start=1, alpha_step=0.25, latent_dim=MIX.latent_dim)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, 24, 24, 1)).astype(np.float32))
    run = make_epoch_runner(MIX, spec, n_epochs=2, donate=False)
    new_state, stats = run(state, images, jax.random.PRNGKey(1), 1)
    stats = np.asarray(stats)
    assert stats.shape == (2, len(STAT_NAMES))
    assert np.isfinite(stats).all()
    # parameters remain float32 (master weights) and actually moved
    leaves = jax.tree.leaves(new_state['g_params'])
    assert all(l.dtype == jnp.float32 for l in leaves)
    w0 = np.asarray(state['g_params']['stem']['conv']['w'])
    w1 = np.asarray(new_state['g_params']['stem']['conv']['w'])
    assert not np.allclose(w0, w1)
    d0 = np.asarray(state['d_params']['head']['conv']['w'])
    d1 = np.asarray(new_state['d_params']['head']['conv']['w'])
    assert not np.allclose(d0, d1)

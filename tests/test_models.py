import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neuron_gan_tpu.models import (
    PGConfig, GrowthState,
    init_generator_pg, init_discriminator_pg,
    generator_pg, discriminator_pg,
)
import torch_mirror


CFG = PGConfig(
    n_gen_features=(32, 16, 8),
    n_dis_features=(8, 16, 32),
    latent_dim=24,
    image_size_init=4,
    precision='highest',
)


@pytest.fixture(scope='module')
def params():
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = init_generator_pg(kg, CFG)
    d = init_discriminator_pg(kd, CFG)
    return jax.tree.map(np.asarray, g), jax.tree.map(np.asarray, d)


def test_generator_shapes(params):
    g, _ = params
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, CFG.latent_dim)))
    for phase in range(CFG.n_phases):
        out = generator_pg(g, jnp.asarray(z), CFG, phase)
        res = CFG.resolution(phase)
        assert out.shape == (2, res, res, CFG.n_colors)
        assert np.abs(np.asarray(out)).max() <= 1.0  # tanh-bounded
    out = generator_pg(g, jnp.asarray(z), CFG, 1, alpha=0.3)
    assert out.shape == (2, 8, 8, CFG.n_colors)


def test_discriminator_shapes(params):
    _, d = params
    for phase in range(CFG.n_phases):
        res = CFG.resolution(phase)
        x = jnp.zeros((2, res, res, CFG.n_colors))
        out = discriminator_pg(d, x, CFG, phase)
        assert out.shape == (2, 1)
    x = jnp.zeros((2, 8, 8, CFG.n_colors))
    assert discriminator_pg(d, x, CFG, 1, alpha=0.5).shape == (2, 1)


@pytest.mark.parametrize('phase,alpha', [(0, None), (1, None), (2, None),
                                         (1, 0.3), (2, 0.7)])
def test_generator_matches_torch_mirror(params, phase, alpha):
    g, _ = params
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (2, CFG.latent_dim)),
                   dtype=np.float32)
    got = np.asarray(generator_pg(g, jnp.asarray(z), CFG, phase, alpha))
    want = torch_mirror.generator_forward(g, z, CFG, phase, alpha)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize('phase,alpha', [(0, None), (1, None), (2, None),
                                         (1, 0.3), (2, 0.7)])
def test_discriminator_matches_torch_mirror(params, phase, alpha):
    _, d = params
    res = CFG.resolution(phase)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                     (2, res, res, CFG.n_colors)), dtype=np.float32)
    got = np.asarray(discriminator_pg(d, jnp.asarray(x), CFG, phase, alpha))
    x_nchw = np.transpose(x, (0, 3, 1, 2))
    want = torch_mirror.discriminator_forward(d, x_nchw, CFG, phase, alpha).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_growth_state_machine():
    gs = GrowthState(CFG)
    assert gs.image_size == 4 and not gs.fading
    gs.increase_resolution()
    assert gs.phase == 1 and gs.alpha == 0.0 and gs.fading
    for _ in range(4):
        gs.advance_transition(0.25)
    assert not gs.fading
    with pytest.raises(AssertionError):
        bad = GrowthState(CFG, phase=0, alpha=0.5)
        bad.increase_resolution()


def test_set_resolution_replay():
    gs = GrowthState(CFG)
    gs.set_resolution(16, alpha=0.5)
    assert gs.phase == 2 and gs.alpha == 0.5 and gs.fading
    gs2 = GrowthState(CFG)
    gs2.set_resolution(16)
    assert gs2.phase == 2 and not gs2.fading
    with pytest.raises(AssertionError):
        GrowthState(CFG).set_resolution(32)  # beyond max


def test_phase_of_resolution():
    assert CFG.phase_of_resolution(4) == 0
    assert CFG.phase_of_resolution(16) == 2
    with pytest.raises(AssertionError):
        CFG.phase_of_resolution(12)

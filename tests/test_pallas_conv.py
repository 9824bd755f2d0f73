"""Fused packed conv3x3+LeakyReLU+grouped-PixelNorm kernel vs the composed
packed ops (ops/pallas_conv.py; interpret mode on CPU — the same kernel
compiles natively on TPU, measured in BASELINE.md "Pallas fused conv
block")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuron_gan_tpu.models import (
    PGConfig, init_generator_pg, init_discriminator_pg,
    generator_pg, discriminator_pg,
)
from neuron_gan_tpu.ops import packed as pk
from neuron_gan_tpu.ops.pallas_conv import packed_conv3x3_lrelu_pn_pallas


def _composed(x, wp, neg_slope=0.2, eps=1e-8):
    y = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = jnp.where(y >= 0, y, y * neg_slope)
    return pk.packed_pixel_norm(y.astype(jnp.float32),
                                eps, f32_stats=True).astype(x.dtype)


def _fused(x, wp):
    return packed_conv3x3_lrelu_pn_pallas(x, wp, 0.2, 1e-8, True)


@pytest.fixture(scope='module')
def case():
    rng = np.random.default_rng(0)
    c = 4
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4 * c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * .3)
    wp = pk.pack_conv3x3_weight(w, 0.7)
    return x, wp


def test_fused_conv_forward_matches_composed(case):
    x, wp = case
    np.testing.assert_allclose(np.asarray(_fused(x, wp)),
                               np.asarray(_composed(x, wp)),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_multirow_tiles():
    # H large enough that the grid runs >1 row tile: the halo specs and
    # boundary masks must reconstruct interior rows exactly
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 2)).astype(np.float32))
    wp = pk.pack_conv3x3_weight(w, 1.0)
    import neuron_gan_tpu.ops.pallas_conv as pc
    tr = pc._row_tile(64, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(_fused(x, wp)),
                               np.asarray(_composed(x, wp)),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_gradients_match_composed(case):
    x, wp = case
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.standard_normal(
        (2, 8, 8, wp.shape[-1])).astype(np.float32))
    gx0, gw0 = jax.grad(lambda a, b: jnp.sum(_composed(a, b) * g), (0, 1))(x, wp)
    gx1, gw1 = jax.grad(lambda a, b: jnp.sum(_fused(a, b) * g), (0, 1))(x, wp)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                               rtol=1e-4, atol=1e-4)


def test_fused_conv_gp_second_order(case):
    """The WGAN-GP path: grad of ||grad_x f||^2 must match the composed
    ops — exercises the dz kernel's own VJP incl. the live r cotangent."""
    x, wp = case

    def gp(f):
        def loss(xx):
            gr = jax.grad(lambda a: jnp.sum(f(a, wp)))(xx)
            return jnp.sum(gr * gr)
        return jax.grad(loss)(x)

    h0, h1 = gp(_composed), gp(_fused)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               rtol=1e-4, atol=1e-3)


def test_fused_conv_bfloat16_tracks_f32(case):
    x, wp = case
    got = np.asarray(_fused(x.astype(jnp.bfloat16), wp)).astype(np.float32)
    want = np.asarray(_composed(x, wp))
    # bf16 operands, f32 accumulation/stats: unit-scale outputs track f32
    # to bf16 resolution
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


CFG_FUSED = PGConfig(n_gen_features=(16, 8, 8), n_dis_features=(8, 8, 16),
                     latent_dim=12, image_size_init=16, packed_min_res=64,
                     precision=None, pallas_conv=True)
CFG_BASE = PGConfig(n_gen_features=(16, 8, 8), n_dis_features=(8, 8, 16),
                    latent_dim=12, image_size_init=16, packed_min_res=64,
                    precision=None, pallas_conv=False)


def test_generator_pallas_conv_matches_composed():
    kg = jax.random.PRNGKey(0)
    params = init_generator_pg(kg, CFG_BASE)
    z = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 12)).astype(np.float32))
    got = generator_pg(params, z, CFG_FUSED, phase=2)
    want = generator_pg(params, z, CFG_BASE, phase=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_discriminator_pallas_conv_matches_composed():
    kd = jax.random.PRNGKey(1)
    params = init_discriminator_pg(kd, CFG_BASE)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 64, 64, 1)).astype(np.float32))
    got = discriminator_pg(params, x, CFG_FUSED, phase=2)
    want = discriminator_pg(params, x, CFG_BASE, phase=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

"""Fused-kernel correctness vs the plain composed ops (interpret mode on CPU;
the same kernels compile natively on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from neuron_gan_tpu.ops import lrelu_pixel_norm
from neuron_gan_tpu.ops.pallas_kernels import lrelu_pixel_norm_pallas


def test_fused_forward_matches_composed():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    got = lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True)
    want = lrelu_pixel_norm(x, 0.2, 1e-8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_backward_matches_composed():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))

    def f_pallas(x):
        return jnp.sum(jnp.sin(lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True)))

    def f_ref(x):
        return jnp.sum(jnp.sin(lrelu_pixel_norm(x, 0.2, 1e-8)))

    g1 = jax.grad(f_pallas)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_fused_handles_nonaligned_rows():
    rng = np.random.default_rng(2)
    # rows not a multiple of the tile: exercise the cdiv grid path
    x = jnp.asarray(rng.standard_normal((3, 5, 7, 8)).astype(np.float32))
    got = lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True)
    want = lrelu_pixel_norm(x, 0.2, 1e-8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Grouped (packed-layout) fused epilogue
# ---------------------------------------------------------------------------

def _composed_packed(x, neg_slope=0.2, eps=1e-8):
    from neuron_gan_tpu.ops.packed import packed_pixel_norm
    from neuron_gan_tpu.ops import leaky_relu
    return packed_pixel_norm(leaky_relu(x, neg_slope), eps)


def test_grouped_forward_matches_composed():
    from neuron_gan_tpu.ops.pallas_kernels import (
        packed_lrelu_pixel_norm_pallas)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 24)).astype(np.float32))
    got = packed_lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True)
    want = _composed_packed(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_grouped_backward_matches_composed():
    from neuron_gan_tpu.ops.pallas_kernels import (
        packed_lrelu_pixel_norm_pallas)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 3, 3, 16)).astype(np.float32))

    g1 = jax.grad(lambda x: jnp.sum(
        jnp.sin(packed_lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(_composed_packed(x))))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def _gp_style_second_order(epilogue):
    """grad_w of a WGAN-GP-shaped penalty: the gradient-norm of a toy critic
    (scale -> epilogue -> sum) w.r.t. its input, differentiated again w.r.t.
    the critic parameter — the exact composition d_grad_pen_loss builds."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 3, 3, 16)).astype(np.float32))

    def gp(w):
        def critic(xi):
            return jnp.sum(epilogue(xi * w) ** 2)
        g = jax.grad(critic)(x)
        norms = jnp.sqrt(jnp.sum(g ** 2, axis=(1, 2, 3)))
        return jnp.sum((norms - 1.0) ** 2)

    return jax.grad(gp)(jnp.float32(1.3))


def test_grouped_gp_double_backward_matches_composed():
    from neuron_gan_tpu.ops.pallas_kernels import (
        packed_lrelu_pixel_norm_pallas)
    got = _gp_style_second_order(
        lambda x: packed_lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True))
    want = _gp_style_second_order(_composed_packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_unpacked_gp_double_backward_matches_composed():
    # regression: the round-1 kernel's backward was an opaque pallas_call,
    # so use_pallas + gradient penalty crashed at trace time
    got = _gp_style_second_order(
        lambda x: lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True))
    want = _gp_style_second_order(lambda x: lrelu_pixel_norm(x, 0.2, 1e-8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_grouped_bfloat16_mixed_semantics():
    # bf16 activations, f32 stats, bf16 out — the compute_dtype='mixed'
    # contract (composed: packed_pixel_norm(leaky_relu(x), f32_stats=True))
    from neuron_gan_tpu.ops.packed import packed_pixel_norm
    from neuron_gan_tpu.ops import leaky_relu
    from neuron_gan_tpu.ops.pallas_kernels import (
        packed_lrelu_pixel_norm_pallas)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 2, 2, 16))).astype(jnp.bfloat16)
    got = packed_lrelu_pixel_norm_pallas(x, 0.2, 1e-8, True)
    want = packed_pixel_norm(leaky_relu(x, 0.2), 1e-8, f32_stats=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)


def test_model_epilogue_flag_matches_einsum_path():
    # packed D forward + grad with the pallas epilogue vs the einsum path
    from neuron_gan_tpu.models import (
        PGConfig, init_discriminator_pg, discriminator_pg)
    kw = dict(n_gen_features=(16, 8, 8), n_dis_features=(8, 8, 16),
              latent_dim=8, image_size_init=4, precision=None,
              packed_min_res=8)
    cfg_e = PGConfig(**kw)                      # einsum epilogue (auto-off)
    cfg_p = PGConfig(**kw, pallas_epilogue=True)
    params = init_discriminator_pg(jax.random.PRNGKey(0), cfg_e)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))

    ye = discriminator_pg(params, x, cfg_e, 2)
    yp = discriminator_pg(params, x, cfg_p, 2)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(ye),
                               rtol=1e-5, atol=1e-5)

    ge = jax.grad(lambda p: jnp.sum(discriminator_pg(p, x, cfg_e, 2)))(params)
    gp = jax.grad(lambda p: jnp.sum(discriminator_pg(p, x, cfg_p, 2)))(params)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

"""Exactness of the space-to-depth packed execution path.

The packed forward must equal the plain forward to float tolerance —
identical parameters, identical math, different layout (ops/packed.py).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuron_gan_tpu.models import (
    PGConfig, init_generator_pg, init_discriminator_pg,
    generator_pg, discriminator_pg)
from neuron_gan_tpu.ops import packed as pk
from neuron_gan_tpu.ops import equalized_conv2d, pixel_norm, avg_pool


CFG = PGConfig(n_gen_features=(32, 16, 8, 8), n_dis_features=(8, 8, 16, 32),
               latent_dim=16, image_size_init=4, precision='highest')
CFG_PACKED = dataclasses.replace(CFG, packed_min_res=16)


def test_space_depth_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(pk.depth_to_space(pk.space_to_depth(x))), np.asarray(x))


def test_packed_conv3x3_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    p = {'w': jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))}
    want = equalized_conv2d(x, p, padding=1, precision='highest')
    got = pk.depth_to_space(pk.packed_equalized_conv3x3(
        pk.space_to_depth(x), p, precision='highest'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv3x3_with_bias():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    p = {'w': jnp.asarray(rng.standard_normal((3, 3, 3, 4)).astype(np.float32)),
         'b': jnp.asarray(rng.standard_normal(4).astype(np.float32))}
    want = equalized_conv2d(x, p, padding=1, precision='highest')
    got = pk.depth_to_space(pk.packed_equalized_conv3x3(
        pk.space_to_depth(x), p, precision='highest'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_pixel_norm_exact():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    want = pixel_norm(x)
    got = pk.depth_to_space(pk.packed_pixel_norm(pk.space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_packed_pixel_norm_mxu_matches_reduce():
    """The einsum (MXU) grouped PixelNorm is the same math as the reduce
    formulation up to summation order (fast path; BASELINE.md), including
    first and second derivatives (the D-side epilogue sits under the GP
    double backward)."""
    import jax
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pk.packed_pixel_norm_mxu(x)),
        np.asarray(pk.packed_pixel_norm(x)), rtol=2e-6, atol=2e-6)
    # mixed-mode f32 stats: the MXU form feeds bf16 operands straight to
    # the dot (f32 accumulation) instead of materializing an f32 copy —
    # documented <=2-bf16-ulp output deviation (2^-8 per ulp) from the
    # materialized-f32 reduce form, and no worse than the bf16 input's own
    # quantization of the exact f32 result
    got_bf = np.asarray(pk.packed_pixel_norm_mxu(
        x.astype(jnp.bfloat16), f32_stats=True).astype(jnp.float32))
    want_bf = np.asarray(pk.packed_pixel_norm(
        x.astype(jnp.bfloat16), f32_stats=True).astype(jnp.float32))
    np.testing.assert_allclose(got_bf, want_bf, rtol=2 * 2.0 ** -8,
                               atol=2 * 2.0 ** -8)
    assert pk.packed_pixel_norm_mxu(
        x.astype(jnp.bfloat16), f32_stats=True).dtype == jnp.bfloat16

    def scalar(fn, v):
        return jnp.sum(jnp.sin(fn(v)))

    g_a = jax.grad(lambda v: scalar(pk.packed_pixel_norm_mxu, v))(x)
    g_b = jax.grad(lambda v: scalar(pk.packed_pixel_norm, v))(x)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=2e-5, atol=2e-5)
    # grad-of-grad-norm, the GP pattern
    def gnorm(f):
        def inner(v):
            g = jax.grad(lambda u: scalar(f, u))(v)
            return jnp.sum(jnp.square(g))
        return inner
    h_a = jax.grad(gnorm(pk.packed_pixel_norm_mxu))(x)
    h_b = jax.grad(gnorm(pk.packed_pixel_norm))(x)
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b),
                               rtol=2e-4, atol=2e-4)


def test_packed_pixel_norm_mxu_matches_einsum_pair():
    """The round-5 same-group-dot formulation vs an inline
    reimplementation of the retired round-2 (GC,G) stats dot + (G,GC)
    broadcast-dot pair, in both the f32-HIGHEST and bf16-MXU modes.  On
    the TPU backend the full-chain deviation measured exactly 0.0
    (tools/epilogue_bench.py sanity check); in general the dot's
    contraction blocking is implementation-defined per output width, so
    this cross-backend test pins the reorder-level bound (1-2 f32 ulps /
    1 bf16 ulp — the fused kernels' accepted float-equivalence class),
    which is what the no-quality-gate argument rests on."""
    from jax import lax

    def pair_form(x_packed, eps=1e-8, f32_stats=False, n_groups=4):
        c4 = x_packed.shape[-1]
        if f32_stats and x_packed.dtype == jnp.bfloat16:
            gb = jnp.asarray(pk._group_mat(c4, n_groups), jnp.bfloat16)
            m4 = jnp.einsum('bhwk,kg->bhwg', jnp.square(x_packed), gb,
                            preferred_element_type=jnp.float32) \
                * (n_groups / c4)
            r = lax.rsqrt(m4 + eps).astype(jnp.bfloat16)
            scale = jnp.einsum('bhwg,kg->bhwk', r, gb,
                               preferred_element_type=jnp.bfloat16)
            return x_packed * scale
        g = jnp.asarray(pk._group_mat(c4, n_groups), jnp.float32)
        m4 = jnp.einsum('bhwk,kg->bhwg', jnp.square(x_packed), g,
                        precision=lax.Precision.HIGHEST) * (n_groups / c4)
        r = lax.rsqrt(m4 + eps)
        out = x_packed * jnp.einsum('bhwg,kg->bhwk', r, g,
                                    precision=lax.Precision.HIGHEST)
        return out.astype(x_packed.dtype)

    rng = np.random.default_rng(55)
    for groups, c4 in [(4, 8), (4, 64), (8, 128)]:
        x = jnp.asarray(
            rng.standard_normal((2, 4, 4, c4)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(pk.packed_pixel_norm_mxu(x, n_groups=groups)),
            np.asarray(pair_form(x, n_groups=groups)),
            rtol=1e-6, atol=1e-6)
        xb = x.astype(jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(pk.packed_pixel_norm_mxu(
                xb, f32_stats=True, n_groups=groups).astype(jnp.float32)),
            np.asarray(pair_form(
                xb, f32_stats=True, n_groups=groups).astype(jnp.float32)),
            rtol=2.0 ** -8, atol=2.0 ** -8)


def test_packed_avg_pool_exact():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    want = avg_pool(x, 2)
    got = pk.packed_avg_pool2(pk.space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_packed_avg_pool_mxu_matches_reduce():
    """The einsum (MXU) parity-group mean matches the reduce formulation
    up to summation order (fast path), including first and second
    derivatives (it sits under the GP double backward on the D side)."""
    import jax
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 12)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pk.packed_avg_pool2_mxu(x)),
        np.asarray(pk.packed_avg_pool2(x)), rtol=2e-6, atol=2e-6)
    # dtype is preserved (mixed path feeds bf16 activations through)
    assert pk.packed_avg_pool2_mxu(x.astype(jnp.bfloat16)).dtype == jnp.bfloat16

    def scalar(fn, v):
        return jnp.sum(jnp.sin(fn(v)))

    g_a = jax.grad(lambda v: scalar(pk.packed_avg_pool2_mxu, v))(x)
    g_b = jax.grad(lambda v: scalar(pk.packed_avg_pool2, v))(x)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=2e-5, atol=2e-5)

    def gnorm(f):
        def inner(v):
            g = jax.grad(lambda u: scalar(f, u))(v)
            return jnp.sum(jnp.square(g))
        return inner
    h_a = jax.grad(gnorm(pk.packed_avg_pool2_mxu))(x)
    h_b = jax.grad(gnorm(pk.packed_avg_pool2))(x)
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b),
                               rtol=2e-4, atol=2e-4)


@pytest.fixture(scope='module')
def params():
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    return (jax.tree.map(np.asarray, init_generator_pg(kg, CFG)),
            jax.tree.map(np.asarray, init_discriminator_pg(kd, CFG)))


@pytest.mark.parametrize('phase,alpha', [(2, None), (3, None), (2, 0.3),
                                         (3, 0.7)])
def test_generator_packed_matches_plain(params, phase, alpha):
    g, _ = params
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, CFG.latent_dim)),
                   dtype=np.float32)
    want = np.asarray(generator_pg(g, jnp.asarray(z), CFG, phase, alpha))
    got = np.asarray(generator_pg(g, jnp.asarray(z), CFG_PACKED, phase, alpha))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize('phase,alpha', [(2, None), (3, None), (2, 0.3),
                                         (3, 0.7)])
def test_discriminator_packed_matches_plain(params, phase, alpha):
    _, d = params
    res = CFG.resolution(phase)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (2, res, res, 1)),
                   dtype=np.float32)
    want = np.asarray(discriminator_pg(d, jnp.asarray(x), CFG, phase, alpha))
    got = np.asarray(discriminator_pg(d, jnp.asarray(x), CFG_PACKED, phase, alpha))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_use_pallas_forward_matches_plain(params):
    g, _ = params
    cfg_pl = dataclasses.replace(CFG, use_pallas=True)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (2, CFG.latent_dim)),
                   dtype=np.float32)
    want = np.asarray(generator_pg(g, jnp.asarray(z), CFG, 2))
    got = np.asarray(generator_pg(g, jnp.asarray(z), cfg_pl, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_packed_training_epoch_stats_match_plain():
    """One full WGAN-GP training epoch through the packed layout reproduces
    the plain layout's loss statistics.

    (Parameter-level equality over multiple steps is NOT testable: Adam's
    sign-normalizing update turns ~1e-6 float-layout noise into full-lr
    differences on near-zero-gradient coordinates.  The mathematically
    guaranteed equivalences — forward values and every gradient path,
    including the GP double-backward — are asserted exactly by the other
    tests in this file.)"""
    from neuron_gan_tpu.train_step import (
        ChunkSpec, make_epoch_runner, make_optimizer, init_train_state)
    spec = ChunkSpec(phase=3, fading=False, n_critic=1, batch_size=2,
                     n_images=4, shuffle=True, crop_size=32, translation=0.05,
                     augment=True, gp_lambda=10.0, drift_epsilon=0.001,
                     sim_lambda0=0.0, sim_decay=0.0, beta1=0.5, rmsprop=False,
                     lr0=1e-3, lr_gamma=0.99, lr_boundary=0, lr_cap=50,
                     alpha_start=0, alpha_step=0.1, latent_dim=CFG.latent_dim)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, 48, 48, 1)).astype(np.float32))

    def run(cfg):
        kg, kd = jax.random.split(jax.random.PRNGKey(0))
        opt = make_optimizer()
        state = init_train_state(init_generator_pg(kg, cfg),
                                 init_discriminator_pg(kd, cfg), opt)
        runner = make_epoch_runner(cfg, spec, n_epochs=1, donate=False)
        state, stats = runner(state, images, jax.random.PRNGKey(1), 1)
        return np.asarray(stats)

    st1 = run(CFG)
    st2 = run(CFG_PACKED)
    np.testing.assert_allclose(st1, st2, rtol=1e-3, atol=1e-4)


def test_packed_gradients_match_plain(params):
    """Backward pass through the packed layout lands identical gradients on
    the (original-format) parameters."""
    g, d = params
    z = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, CFG.latent_dim)),
        dtype=np.float32))

    def loss(gp, cfg):
        x = generator_pg(gp, z, cfg, 3)
        return jnp.sum(discriminator_pg(d, x, cfg, 3))

    grads_plain = jax.grad(lambda p: loss(p, CFG))(g)
    grads_packed = jax.grad(lambda p: loss(p, CFG_PACKED))(g)
    for a, b in zip(jax.tree.leaves(grads_plain), jax.tree.leaves(grads_packed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_up2_conv_matches_decomposed():
    """up2_equalized_conv3x3 == s2d(eq_conv3x3(up2(x))) to float tolerance,
    including the four border bands the zero-padding correction rewrites."""
    from neuron_gan_tpu.ops import upsample2_bilinear
    rng = np.random.default_rng(21)
    for n, ci, co in [(4, 3, 5), (6, 5, 4), (8, 2, 2)]:
        x = jnp.asarray(rng.standard_normal((2, n, n, ci)).astype(np.float32))
        p = {'w': jnp.asarray(
            rng.standard_normal((3, 3, ci, co)).astype(np.float32))}
        want = pk.space_to_depth(equalized_conv2d(
            upsample2_bilinear(x), p, padding=1, precision='highest'))
        got = pk.up2_equalized_conv3x3(x, p, precision='highest')
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_fused_up2_conv_gradients_match_decomposed():
    from neuron_gan_tpu.ops import upsample2_bilinear
    rng = np.random.default_rng(22)
    n, ci, co = 6, 3, 4
    x = jnp.asarray(rng.standard_normal((2, n, n, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((2, n, n, 4 * co)).astype(np.float32))

    def fused(x_, w_):
        return jnp.sum(pk.up2_equalized_conv3x3(x_, {'w': w_},
                                                precision='highest') * ct)

    def decomposed(x_, w_):
        return jnp.sum(pk.space_to_depth(equalized_conv2d(
            upsample2_bilinear(x_), {'w': w_}, padding=1,
            precision='highest')) * ct)

    gx1, gw1 = jax.grad(fused, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(decomposed, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_fused_pool2_conv_matches_decomposed():
    """pool2_equalized_conv3x3 == packed_conv3x3(s2d(group_avg_pool(y)))
    to float tolerance (tap-sum reorder only), incl. bias and borders."""
    rng = np.random.default_rng(31)
    for m, ci, co, bias in [(4, 3, 5, False), (8, 5, 4, True), (6, 2, 2, False)]:
        y = jnp.asarray(
            rng.standard_normal((2, m, m, 4 * ci)).astype(np.float32))
        p = {'w': jnp.asarray(
            rng.standard_normal((3, 3, ci, co)).astype(np.float32))}
        if bias:
            p['b'] = jnp.asarray(rng.standard_normal(co).astype(np.float32))
        want = pk.packed_equalized_conv3x3(
            pk.space_to_depth(pk.packed_avg_pool2(y)), p, precision='highest')
        got = pk.pool2_equalized_conv3x3(y, p, precision='highest')
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_fused_pool2_unpacked_conv_matches_decomposed():
    """pool2_unpacked_equalized_conv3x3 == eq_conv3x3(group_avg_pool(y))."""
    rng = np.random.default_rng(32)
    for m, ci, co, bias in [(4, 3, 5, False), (8, 4, 3, True)]:
        y = jnp.asarray(
            rng.standard_normal((2, m, m, 4 * ci)).astype(np.float32))
        p = {'w': jnp.asarray(
            rng.standard_normal((3, 3, ci, co)).astype(np.float32))}
        if bias:
            p['b'] = jnp.asarray(rng.standard_normal(co).astype(np.float32))
        want = equalized_conv2d(pk.packed_avg_pool2(y), p, padding=1,
                                precision='highest')
        got = pk.pool2_unpacked_equalized_conv3x3(y, p, precision='highest')
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_fused_pool2_conv_gradients_match_decomposed():
    """First and second derivatives (the GP double-backward pattern) of the
    fused boundary conv match the decomposed chain."""
    rng = np.random.default_rng(33)
    m, ci, co = 6, 3, 4
    y = jnp.asarray(rng.standard_normal((2, m, m, 4 * ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    ct = jnp.asarray(
        rng.standard_normal((2, m // 2, m // 2, 4 * co)).astype(np.float32))

    def fused(y_, w_):
        return jnp.sum(jnp.sin(pk.pool2_equalized_conv3x3(
            y_, {'w': w_}, precision='highest')) * ct)

    def decomposed(y_, w_):
        return jnp.sum(jnp.sin(pk.packed_equalized_conv3x3(
            pk.space_to_depth(pk.packed_avg_pool2(y_)), {'w': w_},
            precision='highest')) * ct)

    gx1, gw1 = jax.grad(fused, argnums=(0, 1))(y, w)
    gx2, gw2 = jax.grad(decomposed, argnums=(0, 1))(y, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)

    def gnorm(f):
        def inner(v):
            g = jax.grad(lambda u: f(u, w))(v)
            return jnp.sum(jnp.square(g))
        return inner
    h1 = jax.grad(gnorm(fused))(y)
    h2 = jax.grad(gnorm(decomposed))(y)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-4)


def test_discriminator_fused_pool_matches_decomposed():
    """Full packed discriminator with fuse_pool_conv on vs off (both f32
    highest): same scores to float tolerance, steady and fading — covers
    both the packed→packed and packed→unpacked boundaries."""
    cfg_off = dataclasses.replace(CFG_PACKED, fuse_pool_conv=False)
    cfg_on = dataclasses.replace(CFG_PACKED, fuse_pool_conv=True)
    d = init_discriminator_pg(jax.random.PRNGKey(9), CFG)
    for phase, alpha in [(2, None), (3, None), (3, 0.4)]:
        res = CFG.resolution(phase)
        x = jax.random.normal(jax.random.PRNGKey(10), (2, res, res, 1))
        want = np.asarray(discriminator_pg(d, x, cfg_off, phase, alpha))
        got = np.asarray(discriminator_pg(d, x, cfg_on, phase, alpha))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_generator_fused_up2_matches_decomposed():
    """Full packed generator with fuse_up2_conv on vs off (both f32
    highest): same images to float tolerance across phases and fade-in."""
    cfg_off = dataclasses.replace(CFG_PACKED, fuse_up2_conv=False)
    cfg_on = dataclasses.replace(CFG_PACKED, fuse_up2_conv=True)
    g = init_generator_pg(jax.random.PRNGKey(7), CFG)
    z = jax.random.normal(jax.random.PRNGKey(8), (2, CFG.latent_dim))
    for phase, alpha in [(2, None), (3, None), (3, 0.4)]:
        want = np.asarray(generator_pg(g, z, cfg_off, phase, alpha))
        got = np.asarray(generator_pg(g, z, cfg_on, phase, alpha))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---- full-lane (2x4) packing primitives --------------------------------


def test_space_depth_w_roundtrip():
    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 12)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(pk.depth_to_space_w(pk.space_to_depth_w(x))),
        np.asarray(x))


def test_packed8_conv3x3_exact():
    """2x4-packed conv == unpacked conv (f32 highest, float tolerance)."""
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    p = {'w': jnp.asarray(
        rng.standard_normal((3, 3, 5, 7)).astype(np.float32))}
    want = equalized_conv2d(x, p, padding=1, precision='highest')
    x8 = pk.space_to_depth_w(pk.space_to_depth(x))
    got = pk.depth_to_space(pk.depth_to_space_w(
        pk.packed8_equalized_conv3x3(x8, p, precision='highest')))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed8_conv3x3_with_bias():
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    p = {'w': jnp.asarray(
             rng.standard_normal((3, 3, 3, 4)).astype(np.float32)),
         'b': jnp.asarray(rng.standard_normal(4).astype(np.float32))}
    want = equalized_conv2d(x, p, padding=1, precision='highest')
    x8 = pk.space_to_depth_w(pk.space_to_depth(x))
    got = pk.depth_to_space(pk.depth_to_space_w(
        pk.packed8_equalized_conv3x3(x8, p, precision='highest')))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed8_conv_matches_packed4_layout():
    """packed8 conv == s2dw(packed4 conv): the W-only scatter composes
    with the 2x2 transform rather than re-deriving it."""
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 6)).astype(np.float32))
    p = {'w': jnp.asarray(
        rng.standard_normal((3, 3, 6, 6)).astype(np.float32))}
    x4 = pk.space_to_depth(x)
    want = pk.space_to_depth_w(
        pk.packed_equalized_conv3x3(x4, p, precision='highest'))
    got = pk.packed8_equalized_conv3x3(
        pk.space_to_depth_w(x4), p, precision='highest')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed8_pixel_norm_exact():
    rng = np.random.default_rng(24)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    want = pixel_norm(x)
    x8 = pk.space_to_depth_w(pk.space_to_depth(x))
    got = pk.depth_to_space(pk.depth_to_space_w(pk.packed8_pixel_norm(x8)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_packed8_pixel_norm_mxu_exact():
    rng = np.random.default_rng(25)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 24)).astype(np.float32))
    x8 = pk.space_to_depth_w(pk.space_to_depth(x))
    want = pk.packed8_pixel_norm(x8)
    got = pk.packed8_pixel_norm_mxu(x8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # bf16 path: f32 stats, bf16-rounded output
    got_bf = np.asarray(pk.packed8_pixel_norm_mxu(
        x8.astype(jnp.bfloat16), f32_stats=True)).astype(np.float32)
    np.testing.assert_allclose(got_bf, np.asarray(want), rtol=2e-2,
                               atol=2e-2)


# ---- packed_lanes=128 routing (full-lane block convs) -------------------

# features chosen so the packed block convs hit c4 == 64 (Ci = 16), the
# shape the full-lane branch lifts (flagship's 256^2/512^2 top phases)
CFG_L64 = PGConfig(n_gen_features=(32, 16, 16, 16),
                   n_dis_features=(16, 16, 16, 32),
                   latent_dim=16, image_size_init=4, precision='highest',
                   packed_min_res=16)
CFG_L128 = dataclasses.replace(CFG_L64, packed_lanes=128)


def test_packed8_block_conv_matches_packed4():
    """The routing unit: the full-lane block tail (repack -> epilogue ->
    conv2+epilogue -> unpack) == the 2x2-layout tail (f32 highest)."""
    from neuron_gan_tpu.models.pggan import (
        _packed_conv_lrelu_pn, _packed_lrelu_pn, _packed8_conv_lrelu_pn,
        _packed8_lrelu_pn, _use_packed8)
    rng = np.random.default_rng(30)
    x4 = jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    p = {'w': jnp.asarray(
        rng.standard_normal((3, 3, 16, 16)).astype(np.float32))}
    assert _use_packed8(CFG_L128, x4) and not _use_packed8(CFG_L64, x4)
    want = np.asarray(_packed_conv_lrelu_pn(
        _packed_lrelu_pn(x4, CFG_L64), p, CFG_L64))
    got = np.asarray(pk.depth_to_space_w(_packed8_conv_lrelu_pn(
        _packed8_lrelu_pn(pk.space_to_depth_w(x4), CFG_L128), p,
        CFG_L128)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_generator_packed_lanes_matches():
    g = init_generator_pg(jax.random.PRNGKey(31), CFG_L64)
    z = jax.random.normal(jax.random.PRNGKey(32), (2, CFG_L64.latent_dim))
    for phase, alpha in [(2, None), (3, None), (3, 0.4)]:
        want = np.asarray(generator_pg(g, z, CFG_L64, phase, alpha))
        got = np.asarray(generator_pg(g, z, CFG_L128, phase, alpha))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_discriminator_packed_lanes_matches():
    d = init_discriminator_pg(jax.random.PRNGKey(33), CFG_L64)
    for phase, alpha in [(2, None), (3, None), (3, 0.4)]:
        res = CFG_L64.resolution(phase)
        x = jax.random.normal(jax.random.PRNGKey(34), (2, res, res, 1))
        want = np.asarray(discriminator_pg(d, x, CFG_L64, phase, alpha))
        got = np.asarray(discriminator_pg(d, x, CFG_L128, phase, alpha))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_packed_lanes_mixed_smoke():
    """bf16 mixed path through the full-lane branch: finite outputs, and
    grads flow to the original-format weights."""
    cfg = dataclasses.replace(CFG_L128, precision=None,
                              compute_dtype='mixed')
    g = init_generator_pg(jax.random.PRNGKey(35), cfg)
    z = jax.random.normal(jax.random.PRNGKey(36), (2, cfg.latent_dim))
    y = generator_pg(g, z, cfg, 3, None)
    assert y.dtype == jnp.float32 and np.isfinite(np.asarray(y)).all()
    grads = jax.grad(lambda p: generator_pg(p, z, cfg, 3, None)
                     .astype(jnp.float32).sum())(g)
    gw = grads['blocks'][2]['conv2']['w']
    assert gw.shape == g['blocks'][2]['conv2']['w'].shape
    assert np.isfinite(np.asarray(gw)).all() and np.abs(gw).sum() > 0


def test_packed_lanes_validation():
    with pytest.raises(AssertionError):
        dataclasses.replace(CFG_L64, packed_lanes=96)


def test_pool2_conv_p8_matches_p4():
    """Native packed8 pool+conv == the packed4 fused kernel on repacked
    operands, both output layouts (f32 highest)."""
    rng = np.random.default_rng(40)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6)).astype(np.float32))
    p = {'w': jnp.asarray(
             rng.standard_normal((3, 3, 6, 10)).astype(np.float32)),
         'b': jnp.asarray(rng.standard_normal(10).astype(np.float32))}
    x4 = pk.space_to_depth(x)
    want4 = pk.pool2_equalized_conv3x3(x4, p, precision='highest')
    x8 = pk.space_to_depth_w(x4)
    got8 = pk.pool2_equalized_conv3x3_p8(x8, p, precision='highest',
                                         out_packed8=True)
    np.testing.assert_allclose(
        np.asarray(pk.depth_to_space_w(got8)), np.asarray(want4),
        rtol=1e-5, atol=1e-5)
    got4 = pk.pool2_equalized_conv3x3_p8(x8, p, precision='highest',
                                         out_packed8=False)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want4),
                               rtol=1e-5, atol=1e-5)


def test_pool2_conv_p8_matches_decomposed():
    """Native packed8 pool+conv == the fully decomposed original-domain
    chain (avg-pool, s2d, conv) — catches compounding transform errors."""
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    p = {'w': jnp.asarray(
        rng.standard_normal((3, 3, 4, 4)).astype(np.float32))}
    pooled = avg_pool(x, 2)
    want = pk.space_to_depth(equalized_conv2d(
        pooled, p, padding=1, precision='highest'))
    x8 = pk.space_to_depth_w(pk.space_to_depth(x))
    got = pk.depth_to_space_w(pk.pool2_equalized_conv3x3_p8(
        x8, p, precision='highest'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# ---- native packed8 discriminator region ---------------------------------

CFG_L64F = dataclasses.replace(CFG_L64, fuse_pool_conv=True)
CFG_L128F = dataclasses.replace(CFG_L128, fuse_pool_conv=True)


def test_discriminator_native_p8_matches_packed4():
    """Native 2x4 discriminator region (from_rgb8 -> p8 pool boundaries ->
    p8 interiors -> fallback exit) == the 2x2 fused path (f32 highest)."""
    d = init_discriminator_pg(jax.random.PRNGKey(50), CFG_L64)
    for phase, alpha in [(2, None), (3, None), (3, 0.4)]:
        res = CFG_L64.resolution(phase)
        x = jax.random.normal(jax.random.PRNGKey(51), (2, res, res, 1))
        want = np.asarray(discriminator_pg(d, x, CFG_L64F, phase, alpha))
        got = np.asarray(discriminator_pg(d, x, CFG_L128F, phase, alpha))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_discriminator_native_p8_matches_unpacked():
    """Native 2x4 discriminator == the fully unpacked decomposed chain —
    absolute correctness, not just layout-to-layout agreement."""
    cfg_plain = dataclasses.replace(CFG_L64, packed_min_res=None)
    d = init_discriminator_pg(jax.random.PRNGKey(52), CFG_L64)
    for phase, alpha in [(3, None), (3, 0.4)]:
        res = CFG_L64.resolution(phase)
        x = jax.random.normal(jax.random.PRNGKey(53), (2, res, res, 1))
        want = np.asarray(discriminator_pg(d, x, cfg_plain, phase, alpha))
        got = np.asarray(discriminator_pg(d, x, CFG_L128F, phase, alpha))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_discriminator_native_p8_gp_grads():
    """GP-style double backward through the native p8 region: finite and
    matching the 2x2 fused path."""
    d = init_discriminator_pg(jax.random.PRNGKey(54), CFG_L64)
    res = CFG_L64.resolution(3)
    x = jax.random.normal(jax.random.PRNGKey(55), (2, res, res, 1))

    def gp(cfg):
        def score(v):
            return discriminator_pg(d, v, cfg, 3, None).sum()
        def norm(v):
            g = jax.grad(score)(v)
            return jnp.sum(jnp.square(g))
        return jax.grad(norm)(x)

    h4 = np.asarray(gp(CFG_L64F))
    h8 = np.asarray(gp(CFG_L128F))
    assert np.isfinite(h8).all()
    np.testing.assert_allclose(h8, h4, rtol=5e-4, atol=5e-4)


def test_discriminator_native_p8_mixed_smoke():
    """bf16 mixed path (fused_pool auto-on): finite scores and grads."""
    cfg = dataclasses.replace(CFG_L128, precision=None,
                              compute_dtype='mixed')
    d = init_discriminator_pg(jax.random.PRNGKey(56), cfg)
    res = cfg.resolution(3)
    x = jax.random.normal(jax.random.PRNGKey(57), (2, res, res, 1))
    s = discriminator_pg(d, x, cfg, 3, None)
    assert np.isfinite(np.asarray(s)).all()
    g = jax.grad(lambda p: discriminator_pg(p, x, cfg, 3, None)
                 .astype(jnp.float32).sum())(d)
    gw = g['blocks'][0]['conv1']['w']
    assert np.isfinite(np.asarray(gw)).all() and np.abs(gw).sum() > 0


# ---- native packed8 generator region -------------------------------------

CFG_L64U = dataclasses.replace(CFG_L64, fuse_up2_conv=True)
CFG_L128U = dataclasses.replace(CFG_L128, fuse_up2_conv=True)


def test_up2_conv_p8_matches_p4():
    """Native packed8 up-conv == the W-repacked packed4 fused up-conv
    (identical border-band expressions; interior is the same conv with a
    W-scattered kernel) across geometries."""
    rng = np.random.default_rng(60)
    for n, ci, co in [(4, 3, 5), (8, 5, 7), (6, 2, 4)]:
        x = jnp.asarray(
            rng.standard_normal((2, n, n, ci)).astype(np.float32))
        p = {'w': jnp.asarray(
            rng.standard_normal((3, 3, ci, co)).astype(np.float32))}
        want = pk.space_to_depth_w(
            pk.up2_equalized_conv3x3(x, p, precision='highest'))
        got = pk.up2_equalized_conv3x3_p8(x, p, precision='highest')
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_up2_conv_p8_matches_decomposed():
    """Native packed8 up-conv == the fully decomposed original-domain
    chain (up2, conv, s2d, s2dw) — catches compounding transform errors."""
    from neuron_gan_tpu.ops import upsample2_bilinear
    rng = np.random.default_rng(61)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    p = {'w': jnp.asarray(
        rng.standard_normal((3, 3, 4, 6)).astype(np.float32))}
    want = pk.space_to_depth_w(pk.space_to_depth(equalized_conv2d(
        upsample2_bilinear(x), p, padding=1, precision='highest')))
    got = pk.up2_equalized_conv3x3_p8(x, p, precision='highest')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_generator_native_p8_matches_packed4():
    """Native 2x4 generator region (up-conv8 boundaries -> p8 interiors ->
    p8 to_rgb) == the 2x2 fused path (f32 highest)."""
    g = init_generator_pg(jax.random.PRNGKey(62), CFG_L64)
    z = jax.random.normal(jax.random.PRNGKey(63), (2, CFG_L64.latent_dim))
    for phase, alpha in [(2, None), (3, None), (3, 0.4)]:
        want = np.asarray(generator_pg(g, z, CFG_L64U, phase, alpha))
        got = np.asarray(generator_pg(g, z, CFG_L128U, phase, alpha))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_generator_native_p8_matches_unpacked():
    """Native 2x4 generator == the fully unpacked decomposed chain —
    absolute correctness, not just layout-to-layout agreement."""
    cfg_plain = dataclasses.replace(CFG_L64, packed_min_res=None)
    g = init_generator_pg(jax.random.PRNGKey(64), CFG_L64)
    z = jax.random.normal(jax.random.PRNGKey(65), (2, CFG_L64.latent_dim))
    for phase, alpha in [(3, None), (3, 0.4)]:
        want = np.asarray(generator_pg(g, z, cfg_plain, phase, alpha))
        got = np.asarray(generator_pg(g, z, CFG_L128U, phase, alpha))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_generator_native_p8_grads():
    """Parameter gradients through the native p8 region match the 2x2
    fused path (the boundary kernel's adjoint is exercised end to end)."""
    g = init_generator_pg(jax.random.PRNGKey(66), CFG_L64)
    z = jax.random.normal(jax.random.PRNGKey(67), (2, CFG_L64.latent_dim))

    def loss(cfg):
        return jax.grad(
            lambda p: jnp.sum(jnp.square(generator_pg(p, z, cfg, 3, None))))(g)

    g4 = loss(CFG_L64U)
    g8 = loss(CFG_L128U)
    flat4 = jax.tree_util.tree_leaves(g4)
    flat8 = jax.tree_util.tree_leaves(g8)
    for a, b in zip(flat4, flat8):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_generator_native_p8_mixed_smoke():
    """bf16 mixed path through the native p8 boundary (fused_up2 auto-on):
    finite image, grads flow to the original-format weights."""
    cfg = dataclasses.replace(CFG_L128, precision=None,
                              compute_dtype='mixed')
    g = init_generator_pg(jax.random.PRNGKey(68), cfg)
    z = jax.random.normal(jax.random.PRNGKey(69), (2, cfg.latent_dim))
    y = generator_pg(g, z, cfg, 3, None)
    assert y.dtype == jnp.float32 and np.isfinite(np.asarray(y)).all()
    grads = jax.grad(lambda p: generator_pg(p, z, cfg, 3, None)
                     .astype(jnp.float32).sum())(g)
    gw = grads['blocks'][2]['conv1']['w']
    assert np.isfinite(np.asarray(gw)).all() and np.abs(gw).sum() > 0

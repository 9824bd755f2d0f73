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

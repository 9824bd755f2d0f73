"""Sliced Wasserstein distance metric (neuron_gan_tpu/metrics.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from neuron_gan_tpu.metrics import (
    laplacian_pyramid, sliced_wasserstein, swd_multiscale)


def _structured_set(seed, n=8, res=32, shift=0.0, noise=0.0):
    """Images with consistent local structure: smooth blobs + an edge."""
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing='ij')
    imgs = []
    for _ in range(n):
        cy, cx = rng.uniform(8, res - 8, 2)
        blob = np.exp(-(((ys - cy) ** 2 + (xs - cx) ** 2) / 30.0))
        edge = (xs > rng.uniform(10, 22)).astype(np.float32) * 0.5
        img = blob + edge + shift + noise * rng.standard_normal((res, res))
        imgs.append(img)
    return jnp.asarray(np.stack(imgs)[..., None].astype(np.float32))


def test_identical_descriptor_sets_zero():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((64, 49)).astype(np.float32))
    d = sliced_wasserstein(a, a, jax.random.PRNGKey(0))
    assert float(d) == 0.0


def test_pyramid_reconstructs_shape():
    x = jnp.zeros((2, 32, 32, 1))
    levels = laplacian_pyramid(x, 3)
    assert [l.shape[1] for l in levels] == [32, 16, 8]


def test_swd_discriminates_noise_from_structure():
    real = _structured_set(0)
    same_dist = _structured_set(1)          # same generative process
    noise = jnp.asarray(np.random.default_rng(2)
                        .standard_normal(real.shape).astype(np.float32))
    _, d_same = swd_multiscale(real, same_dist, jax.random.PRNGKey(0),
                               n_patches=512, n_repeats=2)
    _, d_noise = swd_multiscale(real, noise, jax.random.PRNGKey(0),
                                n_patches=512, n_repeats=2)
    # same-process distance is nonzero (estimator bias on tiny 8-image
    # sets: patches within a set are correlated) but the structural gap
    # must dominate it; in an A/B both arms share the bias
    assert d_noise > 2 * d_same, (d_same, d_noise)


def test_swd_detects_blur():
    real = _structured_set(0, noise=0.05)
    blurred = jnp.asarray(real)
    # heavy blur: average pool then nearest-upsample
    b, h, w, c = blurred.shape
    low = blurred.reshape(b, h // 4, 4, w // 4, 4, c).mean(axis=(2, 4))
    blurred = jnp.repeat(jnp.repeat(low, 4, axis=1), 4, axis=2)
    _, d_same = swd_multiscale(real, _structured_set(1, noise=0.05),
                               jax.random.PRNGKey(0), n_patches=512,
                               n_repeats=2)
    _, d_blur = swd_multiscale(real, blurred, jax.random.PRNGKey(0),
                               n_patches=512, n_repeats=2)
    assert d_blur > 1.5 * d_same, (d_same, d_blur)


def test_swd_deterministic_per_key():
    a = _structured_set(0)
    b = _structured_set(1)
    lv1, d1 = swd_multiscale(a, b, jax.random.PRNGKey(7), n_patches=256,
                             n_repeats=1)
    lv2, d2 = swd_multiscale(a, b, jax.random.PRNGKey(7), n_patches=256,
                             n_repeats=1)
    np.testing.assert_array_equal(lv1, lv2)
    assert d1 == d2


def test_swd_below_patch_size_degrades_to_whole_image():
    # early growth phases (4x4, 8x8) are smaller than the 7x7 patch; the
    # metric must degrade to whole-image patches instead of slicing OOB
    import jax
    import numpy as np
    from neuron_gan_tpu.metrics import swd_multiscale
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 4, 4, 1)).astype(np.float32)
    b = rng.standard_normal((8, 4, 4, 1)).astype(np.float32)
    levels, mean = swd_multiscale(a, b, jax.random.PRNGKey(0),
                                  n_patches=64, n_repeats=1)
    assert np.isfinite(mean)
    _, same = swd_multiscale(a, a, jax.random.PRNGKey(0),
                             n_patches=64, n_repeats=1)
    assert same < mean

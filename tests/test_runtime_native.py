"""Native C++ preprocessing runtime vs the numpy reference implementations."""

import numpy as np
import pytest

from neuron_gan_tpu.runtime import (
    native_available, multi_otsu_hist, noise_stats_u8, pad_and_fill_u8)
from neuron_gan_tpu.data.neuron_dataset import (
    _multiotsu_from_hist, threshold_multiotsu)


needs_native = pytest.mark.skipif(
    not native_available(),
    reason='native runtime not built (python -m neuron_gan_tpu.runtime.build)')


@needs_native
def test_native_multiotsu_matches_numpy_dp():
    rng = np.random.default_rng(0)
    img = np.concatenate([
        rng.normal(30, 4, 3000), rng.normal(90, 4, 3000),
        rng.normal(160, 4, 3000), rng.normal(220, 4, 3000),
    ]).clip(0, 255).astype(np.uint8)
    hist = np.bincount(img, minlength=256).astype(np.float64)
    centers = np.arange(256, dtype=np.float64)
    got = multi_otsu_hist(hist, centers, classes=4)
    want = _multiotsu_from_hist(hist, centers, 4)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@needs_native
def test_native_noise_stats():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(64, 64), dtype=np.uint8)
    thresh = 100.0
    mean, std = noise_stats_u8(img, thresh)
    sel = img[(img > 0) & (img < thresh)]
    assert mean == pytest.approx(sel.mean(), rel=1e-12)
    assert std == pytest.approx(sel.std(), rel=1e-9)


@needs_native
def test_native_pad_and_fill_structure():
    rng = np.random.default_rng(2)
    img = rng.integers(10, 255, size=(8, 8), dtype=np.uint8)
    img[0, 0] = 0
    out = pad_and_fill_u8(img, pad=2, mean=20.0, std=3.0, seed=7)
    assert out.shape == (12, 12)
    assert out.dtype == np.float32
    # non-zero source pixels pass through exactly
    np.testing.assert_allclose(out[2:10, 2:10][img > 0],
                               img[img > 0] / 255.0, rtol=1e-6)
    # padding and zero pixels got noise (mean ~20/255)
    border = np.concatenate([out[:2].ravel(), out[-2:].ravel()])
    assert 10 / 255 < border.mean() < 30 / 255
    assert (border >= 0).all() and (border <= 1).all()
    # deterministic per seed
    out2 = pad_and_fill_u8(img, pad=2, mean=20.0, std=3.0, seed=7)
    np.testing.assert_array_equal(out, out2)


def test_threshold_multiotsu_dispatch_consistent():
    """Whichever backend is active, the public API stays sane."""
    rng = np.random.default_rng(3)
    img = np.concatenate([rng.normal(40, 5, 4000),
                          rng.normal(200, 5, 4000)]).clip(0, 255)
    img = img.astype(np.uint8).reshape(80, 100)
    th = threshold_multiotsu(img, classes=4)
    assert len(th) == 3
    assert (np.diff(th) > 0).all()

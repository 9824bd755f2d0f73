"""Native C++ preprocessing runtime vs the numpy reference implementations."""

import numpy as np
import pytest

from neuron_gan_tpu.runtime import (
    native_available, multi_otsu_hist, noise_stats_u8)
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
    # integer sums are exact in double -> the mean is bit-identical;
    # the std differs only in final rounding (preproc.cpp numerics note)
    assert mean == sel.mean()
    assert std == pytest.approx(sel.std(), rel=1e-12)


def test_noise_stats_rejects_non_uint8():
    with pytest.raises(AssertionError):
        noise_stats_u8(np.zeros((4, 4), np.uint16), 10.0)


@needs_native
def test_dataset_dispatches_native_stats(tmp_path, monkeypatch):
    """The production NeuronDataset path reaches the native backend: the
    stats it records match the numpy path's bit-for-bit on the mean (and
    to final-rounding on the std), and the cache key names the backend."""
    from PIL import Image
    from neuron_gan_tpu.data import neuron_dataset as nd

    rng = np.random.default_rng(7)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i in range(2):
        img = rng.normal(20, 5, (32, 32)).clip(0, 255)
        img[8:20, 10:22] = rng.normal(180, 20, (12, 12)).clip(0, 255)
        img[:3, :3] = 0
        Image.fromarray(img.astype(np.uint8), mode='L').save(d / f'i{i}.png')

    ds_native = nd.NeuronDataset(str(d), image_size=32)
    assert ds_native._stats_impl == 'native'
    assert ds_native._cache_key(48)['stats'] == 'native'

    monkeypatch.setattr(
        'neuron_gan_tpu.runtime.native._load', lambda: None)
    ds_numpy = nd.NeuronDataset(str(d), image_size=32)
    assert ds_numpy._stats_impl == 'numpy'
    assert ds_numpy._cache_key(48)['stats'] == 'numpy'
    np.testing.assert_array_equal(ds_native.images_noise_mean,
                                  ds_numpy.images_noise_mean)
    np.testing.assert_allclose(ds_native.images_noise_std,
                               ds_numpy.images_noise_std, rtol=1e-12)
    # identical stats + identical per-image RNG streams -> identical stacks
    np.testing.assert_allclose(np.asarray(ds_native.images),
                               np.asarray(ds_numpy.images), atol=1e-7)


def test_threshold_multiotsu_dispatch_consistent():
    """Whichever backend is active, the public API stays sane."""
    rng = np.random.default_rng(3)
    img = np.concatenate([rng.normal(40, 5, 4000),
                          rng.normal(200, 5, 4000)]).clip(0, 255)
    img = img.astype(np.uint8).reshape(80, 100)
    th = threshold_multiotsu(img, classes=4)
    assert len(th) == 3
    assert (np.diff(th) > 0).all()

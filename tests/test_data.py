import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from neuron_gan_tpu.data import NeuronDataset, threshold_multiotsu
from neuron_gan_tpu.data.augment import (
    AugmentSpec, augment_batch, _affine_warp_nearest, _shear_warp_nearest,
)
from neuron_gan_tpu.ops.resize import resize_antialias


# ---------------------------------------------------------------- multi-Otsu

def test_multiotsu_separates_four_modes():
    rng = np.random.default_rng(0)
    img = np.concatenate([
        rng.normal(30, 3, 4000), rng.normal(90, 3, 4000),
        rng.normal(160, 3, 4000), rng.normal(220, 3, 4000),
    ]).clip(0, 255).astype(np.uint8).reshape(40, -1)
    th = threshold_multiotsu(img, classes=4)
    assert len(th) == 3
    assert 30 < th[0] < 90 and 90 < th[1] < 160 and 160 < th[2] < 220


def test_multiotsu_binary_case():
    rng = np.random.default_rng(1)
    img = np.concatenate([rng.normal(40, 8, 2000), rng.normal(200, 8, 2000)])
    img = img.clip(0, 255).astype(np.uint8).reshape(40, 100)
    th = threshold_multiotsu(img, classes=2)
    assert 40 < th[0] < 200


def test_multiotsu_constant_image():
    img = np.full((8, 8), 7, np.uint8)
    th = threshold_multiotsu(img, classes=4)
    assert np.all(th == 7)


# ---------------------------------------------------------------- dataset

@pytest.fixture(scope='module')
def tiny_dataset_dir(tmp_path_factory):
    """4 synthetic 32x32 uint8 'neuron' images: dark noisy bg, bright blobs."""
    from PIL import Image
    d = tmp_path_factory.mktemp('science_tiny')
    rng = np.random.default_rng(42)
    for i in range(4):
        img = rng.normal(20, 5, (32, 32)).clip(0, 255)
        img[8 + i:20 + i, 10:22] = rng.normal(180, 20, (12, 12)).clip(0, 255)
        img[0:4, 0:4] = 0  # guaranteed zero pixels to noise-fill
        Image.fromarray(img.astype(np.uint8), mode='L').save(d / f'im{i}.png')
    return str(d)


def test_dataset_load(tiny_dataset_dir):
    ds = NeuronDataset(tiny_dataset_dir, image_size=32)
    assert len(ds) == 4
    # padded by image_size//4 = 8 per side
    assert ds.images.shape == (4, 48, 48, 1)
    assert ds.images.dtype == np.float32
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    # zero pixels replaced with noise: no exact zeros in interior corner
    assert (ds.images[0, 8:12, 8:12, 0] != 0).any()
    assert ds.images_noise_mean.shape == (4,)
    ds.set_image_size(16)
    assert ds.image_size == 16
    with pytest.raises(AssertionError):
        ds.set_image_size(64)


# ---------------------------------------------------------------- warp parity

@pytest.mark.parametrize('angle,tx,ty', [(0.0, 0.0, 0.0), (30.0, 2.0, -1.0),
                                         (137.0, -3.0, 4.0), (-90.0, 0.0, 0.0)])
def test_affine_warp_matches_torch_grid_sample(angle, tx, ty):
    rng = np.random.default_rng(1)
    p = 17
    img = rng.random((p, p, 1)).astype(np.float32)
    got = np.asarray(_affine_warp_nearest(jnp.asarray(img), angle, tx, ty,
                                          jnp.asarray(False)))

    # Build the same inverse mapping in pixel space, normalize for
    # grid_sample(align_corners=False), compare nearest+zeros semantics.
    c = (p - 1) / 2.0
    ys, xs = np.meshgrid(np.arange(p), np.arange(p), indexing='ij')
    rad = np.deg2rad(angle)
    ux, uy = xs - c - tx, ys - c - ty
    qx = np.cos(rad) * ux + np.sin(rad) * uy + c
    qy = -np.sin(rad) * ux + np.cos(rad) * uy + c
    gx = (2 * qx + 1) / p - 1
    gy = (2 * qy + 1) / p - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1)[None].astype(np.float32))
    inp = torch.from_numpy(img[None].transpose(0, 3, 1, 2))
    want = F.grid_sample(inp, grid, mode='nearest', padding_mode='zeros',
                         align_corners=False)[0].permute(1, 2, 0).numpy()
    # knife-edge half-pixel ties can resolve differently between the two
    # float pipelines; allow <=1% of pixels to differ
    mismatch = (got != want).mean()
    assert mismatch <= 0.01, f'{mismatch:.3%} pixels differ'


def test_affine_flip_only():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    got = np.asarray(_affine_warp_nearest(jnp.asarray(img), 0.0, 0.0, 0.0,
                                          jnp.asarray(True)))
    np.testing.assert_array_equal(got, img[::-1])


# ---------------------------------------------------------------- augment

def test_augment_batch_no_augment_is_crop_renorm_resize():
    rng = np.random.default_rng(2)
    x = rng.random((3, 24, 24, 1)).astype(np.float32)
    spec = AugmentSpec(crop_size=16, out_size=8, translation=0.0, augment=False)
    got = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(0), spec))
    crop = x[:, 4:20, 4:20, :] * 2.0 - 1.0
    want = np.asarray(resize_antialias(jnp.asarray(crop), 8))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_augment_batch_shapes_range_and_determinism():
    rng = np.random.default_rng(3)
    x = rng.random((4, 24, 24, 1)).astype(np.float32)
    spec = AugmentSpec(crop_size=16, out_size=16, translation=0.05, augment=True)
    a = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(1), spec))
    b = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(1), spec))
    c = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(2), spec))
    assert a.shape == (4, 16, 16, 1)
    assert a.min() >= -1.0 - 1e-6 and a.max() <= 1.0 + 1e-6
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)  # different key -> different augmentation


# ------------------------------------------------------------- lazy loading

def test_lazy_memmap_cache_matches_ram_path(tiny_dataset_dir):
    ram = NeuronDataset(tiny_dataset_dir, image_size=32, seed=3)
    assert ram.preloaded
    lazy = NeuronDataset(tiny_dataset_dir, image_size=32, seed=3,
                         preload_limit_mb=0.0)
    assert not lazy.preloaded
    assert isinstance(lazy.images, np.memmap)
    np.testing.assert_array_equal(np.asarray(lazy.images), ram.images)
    np.testing.assert_array_equal(lazy.images_noise_mean, ram.images_noise_mean)
    # second open hits the cache (and still matches)
    again = NeuronDataset(tiny_dataset_dir, image_size=32, seed=3,
                          preload_limit_mb=0.0)
    np.testing.assert_array_equal(np.asarray(again.images), ram.images)
    np.testing.assert_array_equal(again.images_noise_std, ram.images_noise_std)


def test_lazy_cache_invalidates_on_change(tiny_dataset_dir, tmp_path):
    import shutil
    d = tmp_path / 'ds'
    shutil.copytree(tiny_dataset_dir, d, ignore=shutil.ignore_patterns('.*'))
    first = NeuronDataset(str(d), image_size=32, seed=3, preload_limit_mb=0.0)
    n0 = len(first)
    from PIL import Image
    Image.fromarray(np.full((32, 32), 60, np.uint8), mode='L').save(d / 'zz.png')
    second = NeuronDataset(str(d), image_size=32, seed=3, preload_limit_mb=0.0)
    assert len(second) == n0 + 1
    assert second.images.shape[0] == n0 + 1


def test_nonuniform_image_sizes_pad_to_common_frame(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(5)
    d = tmp_path / 'mixed'
    d.mkdir()
    for i, side in enumerate([24, 32, 28]):
        img = rng.normal(30, 6, (side, side)).clip(0, 255)
        img[4:12, 4:12] = 200
        Image.fromarray(img.astype(np.uint8), mode='L').save(d / f'i{i}.png')
    ds = NeuronDataset(str(d), image_size=32)
    # frame = max side (32) + 2 * (32 // 4)
    assert ds.images.shape == (3, 48, 48, 1)
    # the extra border is noise-filled, not zero
    assert (ds.images[0] == 0).mean() < 0.01


# --------------------------------------------------------------------------
# fast_augment (warp at phase scale; config.fast_augment)
# --------------------------------------------------------------------------

def _smooth_stack(b=4, p=24, c=1, seed=0):
    """Smooth in-range images (Gaussian blobs) so resample order barely matters."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:p, 0:p].astype(np.float64)
    imgs = []
    for _ in range(b):
        cy, cx = rng.uniform(p * 0.3, p * 0.7, 2)
        s = rng.uniform(p * 0.15, p * 0.3)
        imgs.append(0.1 + 0.5 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)))
    return np.stack(imgs)[..., None].astype(np.float32)


def test_warp_window_fusion_is_exact():
    """_affine_warp_nearest(window=(top, s)) == full warp then slice,
    bit-for-bit, across angles/translations/flips (the fast path's crop
    fusion is a pure gather-subset)."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((24, 24, 1)).astype(np.float32))
    top, s = 4, 16
    for angle, tx, ty, flip in [(0.0, 0.0, 0.0, False), (37.0, 2.0, -1.0, True),
                                (-120.0, -3.0, 3.0, False), (179.0, 1.0, 0.0, True)]:
        full = np.asarray(_affine_warp_nearest(img, jnp.float32(angle),
                                               jnp.float32(tx), jnp.float32(ty),
                                               jnp.asarray(flip)))
        win = np.asarray(_affine_warp_nearest(img, jnp.float32(angle),
                                              jnp.float32(tx), jnp.float32(ty),
                                              jnp.asarray(flip), window=(top, s)))
        np.testing.assert_array_equal(full[top:top + s, top:top + s], win)


def test_fast_augment_close_to_exact_at_full_resolution():
    """At out == crop the fused path differs only by jitter order (contrast
    mean over the unwarped frame) and must stay close on smooth images."""
    x = _smooth_stack(b=4, p=24)
    exact = AugmentSpec(crop_size=16, out_size=16, translation=0.1, augment=True)
    fast = AugmentSpec(crop_size=16, out_size=16, translation=0.1, augment=True,
                       fast=True)
    k = jax.random.PRNGKey(5)
    a = np.asarray(augment_batch(jnp.asarray(x), k, exact))
    b = np.asarray(augment_batch(jnp.asarray(x), k, fast))
    assert a.shape == b.shape == (4, 16, 16, 1)
    assert np.abs(a - b).mean() < 0.1
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9


def test_fast_augment_shapes_range_determinism():
    x = _smooth_stack(b=3, p=24)
    spec = AugmentSpec(crop_size=16, out_size=8, translation=0.05, augment=True,
                       fast=True)
    a = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(1), spec))
    b = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(1), spec))
    c = np.asarray(augment_batch(jnp.asarray(x), jax.random.PRNGKey(2), spec))
    assert a.shape == (3, 8, 8, 1)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0
    assert a.min() >= -1.0 - 1e-6 and a.max() <= 1.0 + 1e-6


def test_fast_augment_close_to_exact_on_smooth_images():
    """Same key => same draws (angle/translate/flip/jitter); on smooth images
    warp-then-resize and resize-then-warp must agree closely."""
    x = _smooth_stack(b=4, p=48, seed=3)
    k = jax.random.PRNGKey(11)
    exact = AugmentSpec(crop_size=32, out_size=8, translation=0.05, augment=True)
    fast = AugmentSpec(crop_size=32, out_size=8, translation=0.05, augment=True,
                       fast=True)
    a = np.asarray(augment_batch(jnp.asarray(x), k, exact))
    b = np.asarray(augment_batch(jnp.asarray(x), k, fast))
    assert np.abs(a - b).mean() < 0.1
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9


def test_fast_augment_no_augment_path():
    """augment=False + fast: resize-first then crop == crop then resize for
    the center crop (same proportional frame)."""
    x = _smooth_stack(b=2, p=24)
    exact = AugmentSpec(crop_size=16, out_size=8, translation=0.0, augment=False)
    fast = AugmentSpec(crop_size=16, out_size=8, translation=0.0, augment=False,
                       fast=True)
    k = jax.random.PRNGKey(0)
    a = np.asarray(augment_batch(jnp.asarray(x), k, exact))
    b = np.asarray(augment_batch(jnp.asarray(x), k, fast))
    assert a.shape == b.shape == (2, 8, 8, 1)
    assert np.abs(a - b).mean() < 0.03


def test_lazy_cache_read_only_dir_falls_back_to_ram(tiny_dataset_dir,
                                                    tmp_path, monkeypatch,
                                                    capsys):
    """A dataset directory that cannot host the memmap cache (read-only
    mount) must fall back to the in-RAM path instead of failing."""
    import shutil
    import neuron_gan_tpu.data.neuron_dataset as nd
    d = tmp_path / 'ro_ds'
    shutil.copytree(tiny_dataset_dir, d, ignore=shutil.ignore_patterns('.*'))
    ram = NeuronDataset(str(d), image_size=32, seed=3)

    real_makedirs = os.makedirs

    def deny_cache_dir(path, *a, **kw):
        if '.neuron_gan_cache' in str(path):
            raise OSError(30, 'Read-only file system', str(path))
        return real_makedirs(path, *a, **kw)

    monkeypatch.setattr(nd.os, 'makedirs', deny_cache_dir)
    ds = NeuronDataset(str(d), image_size=32, seed=3, preload_limit_mb=0.0)
    assert ds.preloaded  # fell back
    assert 'cache unavailable' in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(ds.images), ram.images)


# ---------------------------------------------------------------- shear warp

def _shear_reference(img_hw, angle_deg, tx, ty, flip, window):
    """Independent per-pixel evaluation of the shear warp's composition:
    quarter-turn permutation, then the three integer-shift passes
    s3 (x), s2 (y), s1 (x) evaluated pointwise with f32 shift arithmetic
    (matching the jitted path's dtype so rounding boundaries agree)."""
    p = img_hw.shape[0]
    top, s = window
    f32 = np.float32
    rad = f32(angle_deg) * f32(np.pi / 180.0)
    quarter = np.round(rad / f32(np.pi / 2.0))
    m = int(quarter) % 4
    res = f32(rad - quarter * f32(np.pi / 2.0))
    a = f32(np.tan(res / 2.0))
    b = f32(-np.sin(res))
    cos_r, sin_r = f32(np.cos(res)), f32(np.sin(res))
    dx = f32(-(cos_r * tx + sin_r * ty))
    dy = f32(sin_r * tx - cos_r * ty)

    if m == 1:
        im2 = img_hw.T[:, ::-1]
    elif m == 2:
        im2 = img_hw[::-1, ::-1]
    elif m == 3:
        im2 = img_hw.T[::-1, :]
    else:
        im2 = img_hw
    c = (p - 1) / 2.0
    out = np.zeros((s, s), img_hw.dtype)
    for r in range(s):
        yc = f32((r + top) - c)
        for q in range(s):
            xc = f32((q + top) - c)
            x3 = xc + np.round(f32(a * yc))
            y1 = yc + np.round(f32(b * x3 + dy))
            x0 = x3 + np.round(f32(a * y1 + (dx - a * dy)))
            iy, ix = int(y1 + c), int(x0 + c)
            if 0 <= iy < p and 0 <= ix < p:
                out[r, q] = im2[iy, ix]
    return out[::-1] if flip else out


def test_shear_warp_matches_reference_composition():
    """Butterfly shift passes + canvas geometry == pointwise composition,
    bit-for-bit, over general angles/translations/flips (validates both
    the bit-decomposed shifts and that no crop-relevant content ever
    leaves the static canvas)."""
    rng = np.random.default_rng(11)
    img = rng.random((24, 24, 1)).astype(np.float32)
    top, s = 4, 16
    for angle, tx, ty, flip in [(37.0, 2.0, -1.0, False), (-120.0, -3.0, 3.0, True),
                                (179.0, 1.0, 0.0, False), (-44.0, 0.0, 2.0, True),
                                (45.5, -2.0, -2.0, False), (101.3, 3.0, 1.0, True)]:
        got = np.asarray(_shear_warp_nearest(
            jnp.asarray(img), jnp.float32(angle), jnp.float32(tx),
            jnp.float32(ty), jnp.asarray(flip), window=(top, s), max_t=3.0))
        want = _shear_reference(img[..., 0], angle, tx, ty, flip, (top, s))
        np.testing.assert_array_equal(got[..., 0], want,
                                      err_msg=f'angle={angle}')


def test_shear_warp_exact_at_quarter_turns():
    """With zero residual angle the shear warp is a pure permutation and
    must equal the gather warp exactly (quarter turns x integer
    translations x flip)."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((24, 24, 1)).astype(np.float32))
    top, s = 4, 16
    for angle in [0.0, 90.0, -90.0, 180.0, -180.0]:
        for tx, ty, flip in [(0.0, 0.0, False), (2.0, -3.0, True),
                             (-1.0, 1.0, False)]:
            gather = np.asarray(_affine_warp_nearest(
                img, jnp.float32(angle), jnp.float32(tx), jnp.float32(ty),
                jnp.asarray(flip), window=(top, s)))
            shear = np.asarray(_shear_warp_nearest(
                img, jnp.float32(angle), jnp.float32(tx), jnp.float32(ty),
                jnp.asarray(flip), window=(top, s), max_t=3.0))
            np.testing.assert_array_equal(gather, shear,
                                          err_msg=f'angle={angle} t=({tx},{ty})')


def test_shear_warp_close_to_gather_warp():
    """General angles: the two nearest-sampling distributions pick the same
    source pixel almost everywhere (they differ only where the per-pass
    rounding crosses a cell boundary)."""
    x = _smooth_stack(b=1, p=48)[0]
    img = jnp.asarray(x)
    top, s = 8, 32
    diff_frac = []
    for angle in [15.0, 37.0, -62.0, 118.0, -170.0]:
        gather = np.asarray(_affine_warp_nearest(
            img, jnp.float32(angle), jnp.float32(1.0), jnp.float32(-2.0),
            jnp.asarray(False), window=(top, s)))
        shear = np.asarray(_shear_warp_nearest(
            img, jnp.float32(angle), jnp.float32(1.0), jnp.float32(-2.0),
            jnp.asarray(False), window=(top, s), max_t=2.0))
        assert np.corrcoef(gather.ravel(), shear.ravel())[0, 1] > 0.97
        diff_frac.append(np.mean(np.abs(gather - shear) > 1e-6))
    assert np.mean(diff_frac) < 0.35  # same pixel for the large majority


def test_shear_augment_batch_pipeline():
    """Full fast+shear pipeline: shapes, determinism, range, and key
    consumption identical to the gather fast path (same draws)."""
    x = _smooth_stack(b=3, p=24)
    spec_g = AugmentSpec(crop_size=16, out_size=8, translation=0.05,
                         augment=True, fast=True)
    spec_s = AugmentSpec(crop_size=16, out_size=8, translation=0.05,
                         augment=True, fast=True, shear=True)
    k = jax.random.PRNGKey(4)
    a = np.asarray(augment_batch(jnp.asarray(x), k, spec_s))
    b = np.asarray(augment_batch(jnp.asarray(x), k, spec_s))
    g = np.asarray(augment_batch(jnp.asarray(x), k, spec_g))
    assert a.shape == g.shape == (3, 8, 8, 1)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= -1.0 - 1e-6 and a.max() <= 1.0 + 1e-6
    # same parameter draws: the two warps stay close on smooth images
    assert np.abs(a - g).mean() < 0.1


def test_shear_warp_geometry_sweep_bit_exact():
    """The canvas geometry must be bit-exact vs the pointwise reference
    across frame/crop proportions — including frames large enough that the
    canvas CROPS the source (pad < 0) rather than padding it — over dense
    angles (worst-case residuals near +-45deg) and max-magnitude
    translations."""
    rng = np.random.default_rng(17)
    # (p, s): flagship proportion p=1.5s, tight margin p=1.25s-ish,
    # zero margin p=s, and a frame far larger than the crop (crop branch)
    for (pp, ss) in [(24, 16), (20, 16), (16, 16), (48, 16), (36, 24)]:
        img = rng.random((pp, pp, 1)).astype(np.float32)
        top = (pp - ss) // 2
        max_t = 0.05 * pp
        for angle in [-179.3, -135.0, -89.9, -45.2, -44.8, -1.0, 0.4,
                      43.9, 45.1, 90.2, 136.6, 178.2]:
            tx = float(np.round(rng.uniform(-max_t, max_t)))
            ty = float(np.round(rng.uniform(-max_t, max_t)))
            flip = bool(rng.integers(2))
            got = np.asarray(_shear_warp_nearest(
                jnp.asarray(img), jnp.float32(angle), jnp.float32(tx),
                jnp.float32(ty), jnp.asarray(flip), window=(top, ss),
                max_t=max_t))
            want = _shear_reference(img[..., 0], angle, tx, ty, flip,
                                    (top, ss))
            np.testing.assert_array_equal(
                got[..., 0], want,
                err_msg=f'p={pp} s={ss} angle={angle} t=({tx},{ty})')


def test_shear_spec_requires_fast():
    with pytest.raises(ValueError, match='requires fast'):
        AugmentSpec(crop_size=16, out_size=16, fast=False, shear=True)


def test_shear_odd_margin_falls_back_to_gather():
    """An odd crop margin (possible with odd-sized raw images) must not
    crash the shear path — it statically falls back to the crop-fused
    gather warp with identical key consumption."""
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.random((2, 21, 21, 1)).astype(np.float32))
    spec_shear = AugmentSpec(crop_size=16, out_size=16, translation=0.05,
                             augment=True, fast=True, shear=True)
    spec_gather = AugmentSpec(crop_size=16, out_size=16, translation=0.05,
                              augment=True, fast=True, shear=False)
    key = jax.random.PRNGKey(0)
    a = np.asarray(augment_batch(imgs, key, spec_shear))
    b = np.asarray(augment_batch(imgs, key, spec_gather))
    np.testing.assert_array_equal(a, b)  # fallback = the gather path


def test_shear_canvas_is_tight_at_flagship_geometry():
    """Perf regression guard: at the shipping pipeline geometries the
    canvas must not exceed the padded frame (the old crop+max_t bound
    made it ~1.5x the frame => ~2.1x the pixels per butterfly stage)."""
    from neuron_gan_tpu.data.augment import _shear_geometry
    for p, crop in [(768, 512), (384, 256)]:
        canvas, m1, m2 = _shear_geometry(p, crop, 0.05 * p)
        assert canvas == p, (p, canvas)
        assert m2 < canvas // 2

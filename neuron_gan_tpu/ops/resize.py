"""Resampling ops with exact torch semantics, NHWC.

The reference uses three resamplers:

* ``F.interpolate(scale_factor=2, mode='bilinear')`` (align_corners=False) for
  generator upsampling and fade-in skip paths (reference: models.py:257, :335,
  :507) -> ``upsample2_bilinear`` (shift-and-add, exact).
* ``nn.AvgPool2d(k)`` in discriminator blocks (reference: models.py:254) ->
  ``avg_pool``.  Note ``F.interpolate(scale_factor=0.5, mode='bilinear')``
  (the discriminator's fade-in ``downsample``) is *identical* to 2x2 average
  pooling: with half-pixel centers each output samples at (2i+.5, 2j+.5),
  the exact mean of its 4 neighbors -> ``downsample2_bilinear``.
* ``torchvision.transforms.Resize(size, antialias=True)`` in the dataset's
  progressive-resolution path (reference: data/NeuronDataset.py:152) ->
  ``resize_antialias``: separable triangle-filter weight matrices applied as
  two matmuls (compile-time-constant weights, MXU-friendly).
* ``F.interpolate(size=...)`` with default mode='nearest' for upsampling eval
  grids mid-growth (reference: utils.py:600) -> ``resize_nearest``.
"""

import functools

import jax.numpy as jnp
import numpy as np


def _up2_1d(x, axis):
    """Double length along ``axis`` with torch bilinear (align_corners=False).

    out[2k]   = 0.25*x[k-1] + 0.75*x[k]   (edge-clamped)
    out[2k+1] = 0.75*x[k]   + 0.25*x[k+1] (edge-clamped)
    """
    def shift(arr, delta):
        idx = [slice(None)] * arr.ndim
        edge = [slice(None)] * arr.ndim
        if delta == -1:   # left neighbor
            idx[axis] = slice(0, -1)
            edge[axis] = slice(0, 1)
            return jnp.concatenate([arr[tuple(edge)], arr[tuple(idx)]], axis=axis)
        else:             # right neighbor
            idx[axis] = slice(1, None)
            edge[axis] = slice(-1, None)
            return jnp.concatenate([arr[tuple(idx)], arr[tuple(edge)]], axis=axis)

    xl = shift(x, -1)
    xr = shift(x, +1)
    even = 0.25 * xl + 0.75 * x
    odd = 0.75 * x + 0.25 * xr
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * x.shape[axis]
    return stacked.reshape(new_shape)


def upsample2_bilinear(x):
    """NHWC x2 bilinear upsample, exact torch align_corners=False semantics."""
    return _up2_1d(_up2_1d(x, 1), 2)


def avg_pool(x, k):
    """NHWC kxk average pooling (stride k), via reshape-mean (H,W divisible by k)."""
    b, h, w, c = x.shape
    assert h % k == 0 and w % k == 0, f'avg_pool: {h}x{w} not divisible by {k}'
    return x.reshape(b, h // k, k, w // k, k, c).mean(axis=(2, 4))


def downsample2_bilinear(x):
    """x0.5 bilinear (torch align_corners=False) == 2x2 average pooling."""
    return avg_pool(x, 2)


@functools.lru_cache(maxsize=None)
def _resize_weights_np(in_size: int, out_size: int):
    """Torch antialiased-bilinear resize weights as a dense (out, in) matrix.

    Reproduces ATen's upsample_*_aa index/weight computation with
    align_corners=False half-pixel centers and a triangle filter of support
    max(1, in/out).
    """
    scale = in_size / out_size
    # ATen upsample_*_aa: support = scale for downscale, 1 for upscale
    # (bilinear interp_size/2 = 1); window bounds use int() truncation.
    support = max(1.0, scale)
    inv_filter_scale = 1.0 / max(scale, 1.0)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        js = np.arange(xmin, xmax)
        t = (js + 0.5 - center) * inv_filter_scale
        vals = np.clip(1.0 - np.abs(t), 0.0, None)
        s = vals.sum()
        if s > 0:
            vals = vals / s
        else:  # degenerate: fall back to nearest
            vals = np.zeros_like(vals)
            vals[np.argmin(np.abs(t))] = 1.0
        w[i, xmin:xmax] = vals
    return w  # numpy (cached; converted per-trace to avoid tracer leaks)


def _resize_weights(in_size: int, out_size: int, dtype_name: str):
    return jnp.asarray(_resize_weights_np(in_size, out_size),
                       dtype=jnp.dtype(dtype_name))


def resize_antialias(x, out_size):
    """NHWC separable antialiased bilinear resize to (out_size, out_size).

    Matches torchvision Resize(size, antialias=True) on square inputs; also
    correct (plain bilinear) for upscaling, where the filter support is 1.
    """
    b, h, w, c = x.shape
    if isinstance(out_size, int):
        oh = ow = out_size
    else:
        oh, ow = out_size
    if (oh, ow) == (h, w):
        return x
    import jax
    dtype_name = jnp.dtype(jnp.promote_types(x.dtype, jnp.float32)).name
    wh = _resize_weights(h, oh, dtype_name)
    ww = _resize_weights(w, ow, dtype_name)
    # HIGHEST precision: these are data-pipeline resizes where bf16 matmul
    # passes would visibly perturb the (parity-tested) image statistics.
    y = jnp.einsum('oh,bhwc->bowc', wh, x.astype(wh.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum('ow,bhwc->bhoc', ww, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def resize_nearest(x, out_size):
    """NHWC nearest resize, torch 'nearest' convention: src = floor(i*in/out)."""
    b, h, w, c = x.shape
    if isinstance(out_size, int):
        oh = ow = out_size
    else:
        oh, ow = out_size
    hi = (np.arange(oh) * h // oh).astype(np.int32)
    wi = (np.arange(ow) * w // ow).astype(np.int32)
    return x[:, hi][:, :, wi]

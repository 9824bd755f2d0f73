"""On-device (jitted) data augmentation.

Reproduces the reference's per-item torchvision transform stack
(data/NeuronDataset.py:113-126 plus the progressive Resize at :152) as one
pure function of a PRNG key, applied to the HBM-resident image stack:

  1. RandomAffine(degrees=180, translate=(t, t), fill=0) — torchvision tensor
     path: inverse-matrix warp about the image center with align_corners=False
     half-pixel convention, NEAREST sampling (torchvision's default
     interpolation), translations drawn uniform then *rounded to integers*;
  2. RandomVerticalFlip(p=0.5) — folded into the warp matrix;
  3. ColorJitter(brightness=0.25, contrast=0.25) — factors U(0.75, 1.25),
     applied in random order, each blend clamped to [0, 1]; the contrast mean
     is taken over the full (padded) frame, as in the reference where jitter
     precedes the CenterCrop;
  4. CenterCrop(image_size);
  5. Renormalize (0,1) -> (-1,1)  (data/NeuronDataset.py:24-41);
  6. Resize(out_size, antialias=True) when out_size < image_size.

Everything is static-shaped; the only trace-time inputs are the image batch
and the PRNG key, so XLA compiles one fused program per (crop, out) size.
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from neuron_gan_tpu.ops.resize import resize_antialias


@dataclasses.dataclass(frozen=True)
class AugmentSpec:
    crop_size: int            # CenterCrop target (= dataset image_size_max)
    out_size: int             # current phase resolution
    translation: float = 0.0  # RandomAffine translate fraction
    augment: bool = True      # False = crop+renorm+resize only
    degrees: float = 180.0
    # fast=True swaps the resize to the FRONT of the pipeline (the padded
    # stack is antialias-resized to phase scale first, shrinking the
    # gather-bound warp by (crop_size/out_size)^2) AND fuses the pipeline
    # tail: color jitter runs BEFORE the warp (contrast mean over the
    # unwarped padded frame; warp out-of-bounds stays exactly 0) and the
    # center-crop window is fused into the warp gather.  Geometrically
    # equivalent but a different augmentation distribution from the
    # reference's order (warp at full resolution, jitter, then resize —
    # NeuronDataset.py:113-126) at EVERY phase, including out == crop;
    # gated by config.fast_augment after the fused-order SWD quality A/Bs
    # (BASELINE.md).
    fast: bool = False
    # shear=True (requires fast) replaces the nearest-gather affine warp
    # with a 3-pass integer-shift SHEAR rotation (quarter turns factored
    # out as exact permutations): the same rotation+translation+flip
    # family, but pixels round once per shear pass instead of once per
    # point — a slightly different nearest-sampling distribution, in
    # exchange for replacing the random point gather (the single largest
    # op in the step; BASELINE.md op trace) with static-offset shift
    # passes that run ~2x faster on TPU.  Exactly equal to the gather
    # warp whenever the residual angle is 0 (pure quarter turns +
    # translation + flip).  Gated by config.shear_warp.
    shear: bool = False

    def __post_init__(self):
        if self.shear and not self.fast:
            # the non-fused (reference-exact) path has no shear branch; a
            # silent fall-through would ship/benchmark the gather warp
            # while the caller believes it selected shear
            raise ValueError('AugmentSpec.shear requires fast=True '
                             '(the reference-exact order has no shear path)')


def _affine_warp_nearest(img, angle_deg, tx, ty, flip, window=None):
    """Warp one (P, P, C) image: out[p] = img[R(-a)·(p_c - t) + c], zero fill.

    Matches torchvision F.affine on tensors (inverse matrix about the image
    center, grid_sample nearest, align_corners=False) with vertical flip
    composed into the output row index.

    ``window=(top, size)`` computes only the centered size x size block of
    the warped frame (the fast path's crop fusion): identical values to
    warping the full frame then slicing ``[top:top+size, top:top+size]``,
    at size^2 instead of P^2 gather points.
    """
    p = img.shape[0]
    c_half = (p - 1) / 2.0
    if window is None:
        ys = jnp.arange(p, dtype=jnp.float32)
        xs = jnp.arange(p, dtype=jnp.float32)
    else:
        top, size = window
        ys = jnp.arange(size, dtype=jnp.float32) + top
        xs = jnp.arange(size, dtype=jnp.float32) + top
    # vertical flip flips output rows
    ys_eff = jnp.where(flip, (p - 1) - ys, ys)
    uy = ys_eff - c_half          # centered output coords
    ux = xs - c_half

    rad = angle_deg * (math.pi / 180.0)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # inverse rotation applied to translated coords (torchvision
    # _get_inverse_affine_matrix with scale=1, shear=0)
    ux_t = ux - tx
    uy_t = uy - ty
    qx = cos * ux_t[None, :] + sin * uy_t[:, None] + c_half
    qy = -sin * ux_t[None, :] + cos * uy_t[:, None] + c_half

    ix = jnp.round(qx).astype(jnp.int32)
    iy = jnp.round(qy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < p) & (iy >= 0) & (iy < p)
    ixc = jnp.clip(ix, 0, p - 1)
    iyc = jnp.clip(iy, 0, p - 1)
    # flattened 1D take compiles to a much cheaper gather than 2D indexing;
    # indices are clipped above, so XLA may skip its own bounds handling
    idx = iyc * p + ixc
    flat = img.reshape(p * p, img.shape[-1]).at[
        idx.reshape(-1)].get(mode='promise_in_bounds')
    out = flat.reshape(*idx.shape, img.shape[-1])
    return jnp.where(valid[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# Shear-decomposed nearest rotation (AugmentSpec.shear)
#
# R(-t') = Sx(a) Sy(b) Sx(a) with a = tan(t'/2), b = -sin(t') for the
# residual angle t' in [-45deg, 45deg] after factoring the nearest quarter
# turn (an exact pixel permutation).  Each shear is a per-row integer shift
# with zero fill, realized as log2(max_shift) "butterfly" stages of
# static-offset selects — no gathers, so every stage is a fused
# bandwidth-speed pass (the per-row dynamic_slice and take_along_axis
# formulations measured 3.5-32x SLOWER than the point gather; BASELINE.md
# "shear-warp probe").  Gather-pass composition (out[y,x] = in[y, x+s(y)]
# per x-pass, out[y,x] = in[y+s(x), x] per y-pass):
#
#   s1(y) = round(a*y + dx - a*dy)     x-pass
#   s2(x) = round(b*x + dy)            y-pass
#   s3(y) = round(a*y)                 x-pass
#
# with (dx, dy) = -R(-t')*(tx, ty) reproduces source = R(-t')(u - t)
# exactly up to the per-pass rounding (and bit-exactly when t' == 0).
# ---------------------------------------------------------------------------

def _shift_static(c, step):
    """out[..., x] = c[..., x+step] with zero fill (static step)."""
    if step == 0:
        return c
    if step > 0:
        z = jnp.zeros(c.shape[:-1] + (step,), c.dtype)
        return jnp.concatenate([c[..., step:], z], axis=-1)
    z = jnp.zeros(c.shape[:-1] + (-step,), c.dtype)
    return jnp.concatenate([z, c[..., :step]], axis=-1)


def _shift_rows(c, s, max_shift):
    """Per-row shift with zero fill: out[..., y, x] = c[..., y, x+s[y]].

    ``s`` (rows,) int32 in [-max_shift, max_shift]; butterfly over the
    magnitude bits, each stage one fused select over three static-offset
    views."""
    s = jnp.clip(s, -max_shift, max_shift)
    pos = (s > 0)[:, None]
    neg = (s < 0)[:, None]
    mag = jnp.abs(s)
    for b in range(max(1, int(max_shift).bit_length())):
        step = 1 << b
        bit = ((mag >> b) & 1).astype(bool)[:, None]
        c = jnp.where(bit & pos, _shift_static(c, step),
                      jnp.where(bit & neg, _shift_static(c, -step), c))
    return c


def _quarter_turn(img, m):
    """img viewed through R(-90*m) about the (p-1)/2 center (exact pixel
    permutation of a square array; ``m`` is a traced int in [0, 4))."""
    return jax.lax.switch(m, [
        lambda x: x,
        lambda x: x.T[:, ::-1],    # img_k[iy, ix] = img[(P-1)-ix, iy]
        lambda x: x[::-1, ::-1],   # img_k[iy, ix] = img[(P-1)-iy, (P-1)-ix]
        lambda x: x.T[::-1, :],    # img_k[iy, ix] = img[ix, (P-1)-iy]
    ], img)


def _shear_geometry(p, crop, max_t):
    """Static canvas geometry: (canvas, m1, m2) — canvas size and per-pass
    shift bounds.

    The canvas must hold, at every pass, all content that can still reach
    the centered crop window ``s`` (back-propagating the window through the
    read chain x3 = x + round(a*y), y1 = y + round(b*x3 + dy),
    x0 = x3 + round(a*y1 + dx - a*dy), with |a| <= tan(22.5deg),
    |b| <= sin(45deg), |dx|,|dy| <= 1.415*max_t and dx - a*dy = -(tx+a*ty)):

      * pass-2 read columns:   |x3| <= 0.70711*s                (+slack)
      * source / pass-1 rows:  |y1| <= min(p/2, s + 1.415*t)    (+slack)
      * source columns:        |x0| <= min(p/2, 1.1214*s + 2.6*t) (+slack)

    Content beyond these extents can never land in the window, so when the
    padded frame is larger than the canvas the source is center-CROPPED
    into it (the caller handles pad < 0); this keeps every butterfly stage
    at the minimum pixel count — the canvas used to be bounded below by
    crop + max_t + 8 on top of p/2, ~2x the necessary pixels at the
    flagship geometry.  Shift bounds m1/m2 cover the shear offsets at
    every canvas row (m1: 0.41422*H + 1.415*t; m2: 0.70711*H + 1.415*t),
    so the defensive clip in _shift_rows never binds on real content."""
    t_px = int(math.ceil(max_t)) + 2
    half = max(
        int(math.ceil(0.70711 * crop)) + 8,
        min(p // 2, crop + int(math.ceil(1.415 * t_px)) + 8),
        min(p // 2, int(math.ceil(1.1214 * crop + 2.6 * t_px)) + 8),
    )
    canvas = 2 * half + (p % 2)          # canvas - p stays even
    m1 = int(0.41422 * (canvas - 1) / 2 + 1.5 * t_px) + 2
    m2 = int(0.70711 * (canvas - 1) / 2 + 1.5 * t_px) + 2
    return canvas, m1, m2


def _shear_warp_nearest(img, angle_deg, tx, ty, flip, window, max_t):
    """Shear-warp one (P, P, C) image; same parameter conventions as
    _affine_warp_nearest with a mandatory crop ``window=(top, size)`` and a
    STATIC translation bound ``max_t`` (pixels) for the canvas geometry.

    Requires (P - size) even (true for every pipeline geometry: the pad is
    size//4 per side and phase scaling preserves the proportion), so the
    vertical flip is exactly a row reversal of the cropped output.
    """
    p = img.shape[0]
    top, s = window
    assert (p - s) % 2 == 0, 'shear warp needs an even crop margin'
    rad = angle_deg * (math.pi / 180.0)
    quarter = jnp.round(rad / (math.pi / 2.0))
    m = jnp.mod(quarter.astype(jnp.int32), 4)
    res = rad - quarter * (math.pi / 2.0)       # residual in [-45deg, 45deg]
    a = jnp.tan(res / 2.0)
    b = -jnp.sin(res)
    cos_r, sin_r = jnp.cos(res), jnp.sin(res)
    dx = -(cos_r * tx + sin_r * ty)
    dy = sin_r * tx - cos_r * ty

    canvas, m1, m2 = _shear_geometry(p, s, max_t)
    half_c = (canvas - 1) / 2.0
    pad = (canvas - p) // 2

    x = img.transpose(2, 0, 1)                  # channels to front
    x = jax.vmap(_quarter_turn, in_axes=(0, None))(x, m)
    if pad >= 0:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    else:
        # frame larger than the canvas: center-crop away content that can
        # never reach the crop window (see _shear_geometry)
        k = -pad
        x = x[:, k:p - k, k:p - k]

    ys = jnp.arange(canvas, dtype=jnp.float32) - half_c
    s1 = jnp.round(a * ys + (dx - a * dy)).astype(jnp.int32)
    s2 = jnp.round(b * ys + dy).astype(jnp.int32)
    s3 = jnp.round(a * ys).astype(jnp.int32)

    x = _shift_rows(x, s1, m1)                  # x-pass
    x = x.transpose(0, 2, 1)
    x = _shift_rows(x, s2, m2)                  # y-pass
    x = x.transpose(0, 2, 1)
    x = _shift_rows(x, s3, m1)                  # x-pass

    c0 = top + pad
    out = x[:, c0:c0 + s, c0:c0 + s]
    out = jnp.where(flip, out[:, ::-1, :], out)
    return out.transpose(1, 2, 0)


def _color_jitter(img, key):
    """brightness/contrast jitter, random order, clamp [0,1] per blend."""
    k_order, k_b, k_c = jax.random.split(key, 3)
    b = jax.random.uniform(k_b, (), minval=0.75, maxval=1.25)
    c = jax.random.uniform(k_c, (), minval=0.75, maxval=1.25)

    def brightness(x):
        return jnp.clip(x * b, 0.0, 1.0)

    def contrast(x):
        mean = jnp.mean(x)
        return jnp.clip(c * x + (1.0 - c) * mean, 0.0, 1.0)

    first_b = jax.random.bernoulli(k_order)
    return jax.lax.cond(first_b,
                        lambda x: contrast(brightness(x)),
                        lambda x: brightness(contrast(x)), img)


def _augment_one(img, key, spec: AugmentSpec, fused=False):
    """img: (P, P, C) in [0,1] -> (crop, crop, C) in [-1,1] (pre-resize).

    ``fused`` (the fast path): jitter runs BEFORE the warp (its contrast
    mean is then over the unwarped padded frame — no full-frame gather
    needed) and the warp computes only the centered crop window, so the
    gather shrinks from P^2 to crop^2 points.  Same parameter draws as the
    exact order (identical key consumption)."""
    p = img.shape[0]
    s = spec.crop_size
    top = int(round((p - s) / 2.0))  # CenterCrop: top = round((P - S)/2)
    if spec.augment:
        k_a, k_t1, k_t2, k_f, k_j = jax.random.split(key, 5)
        angle = jax.random.uniform(k_a, (), minval=-spec.degrees,
                                   maxval=spec.degrees)
        max_t = spec.translation * p
        # torchvision rounds sampled translations to integer pixels
        tx = jnp.round(jax.random.uniform(k_t1, (), minval=-max_t, maxval=max_t))
        ty = jnp.round(jax.random.uniform(k_t2, (), minval=-max_t, maxval=max_t))
        flip = jax.random.bernoulli(k_f)
        if fused:
            img = _color_jitter(img, k_j)
            # the shear warp needs an even crop margin (its flip is a row
            # reversal of the centered window); geometries with an odd
            # margin — possible with odd-sized raw images — fall back to
            # the crop-fused gather warp (static, decided at trace time)
            if spec.shear and (p - s) % 2 == 0:
                img = _shear_warp_nearest(img, angle, tx, ty, flip,
                                          window=(top, s), max_t=max_t)
            else:
                img = _affine_warp_nearest(img, angle, tx, ty, flip,
                                           window=(top, s))
            return img * 2.0 - 1.0
        img = _affine_warp_nearest(img, angle, tx, ty, flip)
        img = _color_jitter(img, k_j)
    img = jax.lax.dynamic_slice(img, (top, top, 0), (s, s, img.shape[-1]))
    # Renormalize (0,1) -> (-1,1)
    return img * 2.0 - 1.0


@functools.partial(jax.jit, static_argnames=('spec',))
def augment_batch(images, key, spec: AugmentSpec):
    """images: (B, P, P, C) in [0,1] -> (B, out, out, C) in [-1,1]."""
    fused = spec.fast
    if spec.fast and spec.out_size < spec.crop_size:
        # Fast path: move the downscale to the front (two small einsums),
        # then jitter + crop-fused warp at phase scale.  The padded frame
        # keeps the same proportion (p_small/out == p/crop), so the
        # center-crop offset and the fractional translation range map
        # exactly; the gather runs over out^2 points instead of P^2.
        p = images.shape[1]
        p_small = int(round(p * spec.out_size / spec.crop_size))
        if spec.shear and (p_small - spec.out_size) % 2 and (p - spec.crop_size) % 2 == 0:
            # keep the phase-scale margin even (round() can flip parity)
            # so the shear warp stays active below the top phase; one
            # pixel of frame proportion, same order as the round() above
            p_small += 1
        images = resize_antialias(images, p_small)
        spec = dataclasses.replace(spec, crop_size=spec.out_size)
    keys = jax.random.split(key, images.shape[0])
    out = jax.vmap(lambda im, k: _augment_one(im, k, spec, fused=fused))(
        images, keys)
    if spec.out_size < spec.crop_size:
        out = resize_antialias(out, spec.out_size)
    return out

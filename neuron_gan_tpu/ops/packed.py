"""Space-to-depth packed execution for narrow-channel, high-resolution convs.

Why: the PGGAN's high-resolution layers have 16-32 channels, so a 3x3 conv
feeds the 128x128 MXU at ~12% lane occupancy on both operands — the
per-step ceiling is shape-limited, not FLOP-limited (BASELINE.md).  Packing
2x2 spatial blocks into channels (NHWC (B,R,R,C) -> (B,R/2,R/2,4C)) raises
occupancy ~16x for 4x the FLOPs — a classic TPU layout transform.

The transform is **exact**: a stride-1 zero-padded 3x3 conv on the original
domain equals a 3x3 conv on the packed domain with a scatter-transformed
kernel.  Derivation: output pixel (2p+a, 2q+b) pulls original rows
2p+a+dy; with (P, a') = divmod(a+dy, 2) each (dy, a) maps to exactly one
packed offset/parity, so the packed kernel W[P,Q,(a',b',i),(a,b,o)] is a
permutation-scatter of w[dy,dx,i,o] (no collisions).  Packed zero padding
(one packed ring = two original pixels) is also exact because the scattered
kernel never reads the extra ring.

Parameters stay in the ORIGINAL (HWIO, unpacked) format — checkpointing and
reference-weight import are untouched; the packed path is a pure forward
rewrite, and the weight scatter is differentiable so gradients land on the
original weights automatically.

Channel order convention: packed channel index = (a*2 + b) * C + i
(parity-major, original-channel minor) — what ``space_to_depth`` produces.
"""

import math

import jax.numpy as jnp
import numpy as np
from jax import lax

from neuron_gan_tpu.ops.equalized import calculate_gain


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (a, b, i)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """(B, H, W, 4C) -> (B, 2H, 2W, C), inverse of space_to_depth."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def pack_conv3x3_weight(w, scale=1.0):
    """Transform an HWIO 3x3 kernel (3,3,Ci,Co) into the packed-domain kernel
    (3,3,4Ci,4Co) such that packed_conv(s2d(x), W) == s2d(conv(x, w)).

    ``scale`` folds the equalized-LR runtime factor into the same transform.
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, 'pack_conv3x3_weight expects a 3x3 kernel'
    w = w * jnp.asarray(scale, w.dtype)
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    # (P, a') = divmod(a + dy, 2) with dy in {-1, 0, 1}; offset index P+1
    for a in (0, 1):
        for b in (0, 1):
            for dy in (-1, 0, 1):
                P, ap = divmod(a + dy, 2)
                for dx in (-1, 0, 1):
                    Q, bp = divmod(b + dx, 2)
                    out = out.at[
                        P + 1, Q + 1,
                        (ap * 2 + bp) * ci:(ap * 2 + bp + 1) * ci,
                        (a * 2 + b) * co:(a * 2 + b + 1) * co,
                    ].set(w[dy + 1, dx + 1])
    return out


def packed_equalized_conv3x3(x_packed, params, *, neg_slope=0.2,
                             precision=None):
    """Equalized-LR 3x3 conv executed in the packed domain.

    ``params['w']`` is the ORIGINAL (3,3,Ci,Co) kernel; the equalized scale
    uses the original fan_in (models.py:186-201 semantics).
    """
    w = params['w']
    fan_in = w.shape[2] * 9
    scale = calculate_gain('leaky_relu', neg_slope) / math.sqrt(fan_in)
    w_packed = pack_conv3x3_weight(w, scale)
    y = lax.conv_general_dilated(
        x_packed, w_packed.astype(x_packed.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        bb = jnp.tile(params['b'], 4)
        y = y + bb.astype(y.dtype)
    return y


def packed_pixel_norm(x_packed, eps=1e-8, f32_stats=False):
    """PixelNorm over ORIGINAL channels: normalize each (a, b) group's C
    channels independently.  ``f32_stats`` mirrors ops.pixel_norm: float32
    statistics + normalization, result cast back to the input dtype."""
    b, h, w, c4 = x_packed.shape
    c = c4 // 4
    xg = x_packed.reshape(b, h, w, 4, c)
    if f32_stats and xg.dtype != jnp.float32:
        xf = xg.astype(jnp.float32)
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xg = (xf * lax.rsqrt(ms + eps)).astype(x_packed.dtype)
        return xg.reshape(b, h, w, c4)
    ms = jnp.mean(jnp.square(xg), axis=-1, keepdims=True)
    return (xg * lax.rsqrt(ms + eps)).reshape(b, h, w, c4)


def packed_conv1x1(x_packed, params, *, precision=None):
    """1x1 conv (to_rgb/from_rgb) applied per parity group: block-diagonal
    1x1 conv in the packed domain."""
    w = params['w']  # (1, 1, Ci, Co)
    ci, co = w.shape[2], w.shape[3]
    wb = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for g in range(4):
        wb = wb.at[:, :, g * ci:(g + 1) * ci, g * co:(g + 1) * co].set(w)
    y = lax.conv_general_dilated(
        x_packed, wb.astype(x_packed.dtype), window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        y = y + jnp.tile(params['b'], 4).astype(y.dtype)
    return y


def packed_avg_pool2(x_packed):
    """2x2 average pooling of the original image == mean over the 4 parity
    groups at each packed pixel.  Output is UNPACKED at half resolution."""
    b, h, w, c4 = x_packed.shape
    c = c4 // 4
    return x_packed.reshape(b, h, w, 4, c).mean(axis=3)


def packed_upsample2_bilinear(x_packed):
    """x2 bilinear upsample in the packed domain.

    Input: packed rep of res R (spatial R/2); output: packed rep of res 2R
    (spatial R).  Implemented exactly via unpack -> shift-add up2 -> repack
    (pure VPU reshuffles; no gathers).
    """
    from neuron_gan_tpu.ops.resize import upsample2_bilinear
    return space_to_depth(upsample2_bilinear(depth_to_space(x_packed)))

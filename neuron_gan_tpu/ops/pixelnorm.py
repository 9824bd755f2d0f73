"""PixelNorm and LeakyReLU (functional, NHWC).

PixelNorm normalizes each pixel's feature vector:
``x / sqrt(mean(x^2, channel) + eps)`` (reference: models.py:104-129, the
"Option 2" the reference settled on).  Channels are the last axis here.

``lrelu_pixel_norm`` is the fused form of the LeakyReLU->PixelNorm pair that
follows every conv in the PGGAN blocks (reference: models.py:259-268) — XLA
fuses this chain into the conv epilogue on TPU; an optional Pallas kernel
lives in ops/pallas_kernels.py for when profiling justifies hand-fusion.
"""

import jax
import jax.numpy as jnp


def leaky_relu(x, neg_slope=0.2):
    return jnp.where(x >= 0, x, x * neg_slope)


def pixel_norm(x, eps=1e-8, f32_stats=False):
    """Per-pixel feature normalization over the channel (last) axis.

    ``f32_stats`` computes the mean-of-squares and the normalization in
    float32 and casts the result back to ``x.dtype`` — the quality-safe
    half of the ``compute_dtype='mixed'`` recipe (bfloat16 activations,
    full-precision normalization statistics)."""
    if f32_stats and x.dtype != jnp.float32:
        xf = x.astype(jnp.float32)
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype)
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps)


def lrelu_pixel_norm(x, neg_slope=0.2, eps=1e-8, f32_stats=False):
    return pixel_norm(leaky_relu(x, neg_slope), eps, f32_stats=f32_stats)


def init_cubic_activation():
    """Learnable cubic activation params (reference utils.py:32-49; unused by
    the reference's training paths, kept for capability parity)."""
    return {'a': jnp.ones(()), 'b': jnp.ones(()), 'c': jnp.ones(())}


def cubic_activation(x, params):
    """f(x) = a*x^3 + b*x^2 + c*x with learnable a, b, c."""
    return params['a'] * x ** 3 + params['b'] * x ** 2 + params['c'] * x

"""Equalized-learning-rate convolution and linear ops (functional).

The reference implements equalized LR as torch module subclasses that
kaiming-initialize their weights and then *additionally* rescale the input by
``gain / sqrt(fan_in)`` at every forward (reference: models.py:172-241;
He 2015 / PGGAN equalized learning rate).  Scaling the input of a linear map
is mathematically identical to scaling its weight, so here we scale the
weight: a multiply over O(params) elements that XLA folds into the conv,
instead of a multiply over O(activations).

Data layout is NHWC with HWIO weights — the TPU-native layout (channels on
the 128-wide lane dimension feeding the MXU).
"""

import math

import jax
import jax.numpy as jnp
from jax import lax


def calculate_gain(nonlinearity='leaky_relu', param=0.2):
    """torch.nn.init.calculate_gain for the subset the reference uses."""
    if nonlinearity == 'leaky_relu':
        return math.sqrt(2.0 / (1.0 + param ** 2))
    if nonlinearity == 'linear':
        return 1.0
    if nonlinearity == 'relu':
        return math.sqrt(2.0)
    if nonlinearity == 'tanh':
        return 5.0 / 3.0
    raise ValueError(f'unsupported nonlinearity: {nonlinearity}')


def _conv_fan_in(weight):
    """fan_in of an HWIO conv weight: in_channels * prod(kernel)."""
    kh, kw, c_in, _ = weight.shape
    return c_in * kh * kw


def init_conv2d(key, c_in, c_out, kernel_size, *, bias=True, neg_slope=0.2,
                dtype=jnp.float32):
    """Kaiming-normal conv init (fan_in, leaky_relu gain; reference models.py:31-34).

    Returns a dict {'w': HWIO, ['b': (c_out,)]} — weights drawn with
    std = gain/sqrt(fan_in), biases zero.
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kh, kw = kernel_size
    fan_in = c_in * kh * kw
    std = calculate_gain('leaky_relu', neg_slope) / math.sqrt(fan_in)
    w = std * jax.random.normal(key, (kh, kw, c_in, c_out), dtype=dtype)
    p = {'w': w}
    if bias:
        p['b'] = jnp.zeros((c_out,), dtype=dtype)
    return p


def init_linear(key, d_in, d_out, *, bias=True, neg_slope=0.2, dtype=jnp.float32):
    """Kaiming-normal linear init; weight stored as (d_in, d_out)."""
    std = calculate_gain('leaky_relu', neg_slope) / math.sqrt(d_in)
    w = std * jax.random.normal(key, (d_in, d_out), dtype=dtype)
    p = {'w': w}
    if bias:
        p['b'] = jnp.zeros((d_out,), dtype=dtype)
    return p


def conv2d(x, params, *, stride=1, padding='SAME', precision=None):
    """Plain NHWC conv (used by ToImage/FromImage, which are *not* equalized —
    reference models.py:133-168 applies no runtime weight scale to them)."""
    w = params['w']
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if 'b' in params:
        y = y + params['b'].astype(y.dtype)
    return y


def equalized_conv2d(x, params, *, stride=1, padding='SAME', neg_slope=0.2,
                     gain_nonlinearity='leaky_relu', precision=None):
    """Conv with the equalized-LR runtime scale ``gain/sqrt(fan_in)``.

    Matches reference models.py:203-204 (`super().forward(weight_scale * x)`)
    by scaling the weight instead of the input — identical math for the
    weight term, and the bias is unscaled in both formulations.
    """
    w = params['w']
    scale = calculate_gain(gain_nonlinearity, neg_slope) / math.sqrt(_conv_fan_in(w))
    scaled = {'w': w * jnp.asarray(scale, w.dtype)}
    if 'b' in params:
        scaled['b'] = params['b']
    return conv2d(x, scaled, stride=stride, padding=padding, precision=precision)


def equalized_linear(x, params, *, neg_slope=0.2, gain_nonlinearity='leaky_relu',
                     precision=None):
    """Linear with equalized-LR runtime scale (reference models.py:208-241)."""
    w = params['w']
    scale = calculate_gain(gain_nonlinearity, neg_slope) / math.sqrt(w.shape[0])
    y = jnp.dot(x, (w * jnp.asarray(scale, w.dtype)).astype(x.dtype),
                precision=precision)
    if 'b' in params:
        y = y + params['b'].astype(y.dtype)
    return y

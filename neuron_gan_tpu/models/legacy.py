"""Legacy model families: DCGAN and fixed-resolution WGAN nets.

Capability parity with reference models.py:622-790.  These are the
reference's earlier architectures (kept runnable there via ``--wgan``;
dcgan's trainer raises, train.py:629 — mirrored by our driver).

Torch-exact building blocks:
* ``conv_transpose2d`` — ConvTranspose2d(k, s, p) expressed as an
  input-dilated convolution with spatially-flipped weights (the standard
  equivalence), NHWC activations.
* ``batch_norm`` — training mode normalizes with biased batch statistics and
  updates running stats with *unbiased* variance at momentum 0.1 (torch
  semantics); eval mode uses running stats.

Weight init replicates the reference's ``init_weights`` (utils.py:96-101):
conv/convT ~ N(0, 0.02); BN weight ~ N(1, 0.02), bias 0.  Linear layers use
torch's default (kaiming-uniform-ish) — here N(0, 1/sqrt(fan_in)) is used,
matching variance; the legacy nets are not weight-import targets.
"""

import math

import jax
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------------------
# ops
# --------------------------------------------------------------------------

def conv2d_plain(x, w_hwio, b=None, stride=2, padding=1, precision=None):
    y = lax.conv_general_dilated(
        x, w_hwio.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(x, w_hwio, b=None, stride=2, padding=1, precision=None):
    """torch ConvTranspose2d(k, stride, padding) on NHWC.

    ``w_hwio``: (kh, kw, in, out) where 'in' is the *input* channel count —
    i.e. torch's (in, out, kh, kw) transposed to (kh, kw, in, out).
    Implemented as conv with lhs_dilation=stride, padding k-1-p, and
    spatially-flipped weights.
    """
    kh, kw = w_hwio.shape[0], w_hwio.shape[1]
    w_flip = w_hwio[::-1, ::-1]
    y = lax.conv_general_dilated(
        x, w_flip.astype(x.dtype), window_strides=(1, 1),
        padding=[(kh - 1 - padding, kh - 1 - padding),
                 (kw - 1 - padding, kw - 1 - padding)],
        lhs_dilation=(stride, stride),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=precision)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def batch_norm(x, params, state, training=True, momentum=0.1, eps=1e-5):
    """NHWC batch norm; returns (y, new_state)."""
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        var_unbiased = var * n / max(n - 1, 1)
        new_state = {
            'mean': (1 - momentum) * state['mean'] + momentum * mean,
            'var': (1 - momentum) * state['var'] + momentum * var_unbiased,
        }
    else:
        mean, var = state['mean'], state['var']
        new_state = state
    y = (x - mean) * lax.rsqrt(var + eps)
    return y * params['scale'] + params['bias'], new_state


# --------------------------------------------------------------------------
# init helpers (reference utils.py:96-101 semantics)
# --------------------------------------------------------------------------

def _init_conv_w(key, kh, kw, c_in, c_out, std=0.02):
    return std * jax.random.normal(key, (kh, kw, c_in, c_out))


def _init_bn(key, c):
    return ({'scale': 1.0 + 0.02 * jax.random.normal(key, (c,)),
             'bias': jnp.zeros((c,))},
            {'mean': jnp.zeros((c,)), 'var': jnp.ones((c,))})


def _init_linear(key, d_in, d_out):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {'w': jax.random.uniform(k1, (d_in, d_out), minval=-bound, maxval=bound),
            'b': jax.random.uniform(k2, (d_out,), minval=-bound, maxval=bound)}


# --------------------------------------------------------------------------
# WGAN nets (reference models.py:728-790)
# --------------------------------------------------------------------------

def init_generator_wgan(key, n_features, latent_dim=512, image_size=512,
                        n_colors=1):
    n_layers = len(n_features)
    init = image_size // (2 ** n_layers)
    ks = iter(jax.random.split(key, 3 * n_layers + 4))
    params = {'linear': _init_linear(next(ks), latent_dim,
                                     n_features[0] * init * init)}
    bn_p, bn_s = _init_bn(next(ks), n_features[0])
    params['bn0'], state0 = bn_p, bn_s
    bn_states = {'bn0': state0}
    params['blocks'] = []
    for i in range(n_layers - 1):
        w = _init_conv_w(next(ks), 4, 4, n_features[i], n_features[i + 1])
        b = jnp.zeros((n_features[i + 1],))
        bp, bs = _init_bn(next(ks), n_features[i + 1])
        params['blocks'].append({'w': w, 'b': b, 'bn': bp})
        bn_states[f'block{i}'] = bs
    params['final'] = {'w': _init_conv_w(next(ks), 4, 4, n_features[-1], n_colors),
                       'b': jnp.zeros((n_colors,))}
    meta = {'n_features': tuple(n_features), 'latent_dim': latent_dim,
            'image_size': image_size, 'init': init, 'n_colors': n_colors}
    return params, bn_states, meta


def generator_wgan(params, bn_states, z, meta, training=True, precision=None):
    init, f0 = meta['init'], meta['n_features'][0]
    x = z @ params['linear']['w'] + params['linear']['b']
    x = x.reshape(-1, f0, init, init).transpose(0, 2, 3, 1)  # CHW order parity
    new_states = {}
    x, new_states['bn0'] = batch_norm(x, params['bn0'], bn_states['bn0'], training)
    x = jnp.where(x >= 0, x, 0.2 * x)
    for i, blk in enumerate(params['blocks']):
        x = conv_transpose2d(x, blk['w'], blk['b'], precision=precision)
        x, new_states[f'block{i}'] = batch_norm(x, blk['bn'],
                                                bn_states[f'block{i}'], training)
        x = jnp.where(x >= 0, x, 0.2 * x)
    x = conv_transpose2d(x, params['final']['w'], params['final']['b'],
                         precision=precision)
    return jnp.tanh(x), new_states


def init_discriminator_wgan(key, n_features, image_size=512, n_colors=1):
    n_layers = len(n_features)
    ks = iter(jax.random.split(key, 3 * n_layers + 4))
    params = {'conv0': {'w': _init_conv_w(next(ks), 4, 4, n_colors, n_features[0]),
                        'b': jnp.zeros((n_features[0],))}}
    bn_states = {}
    params['blocks'] = []
    for i in range(n_layers - 1):
        w = _init_conv_w(next(ks), 4, 4, n_features[i], n_features[i + 1])
        bp, bs = _init_bn(next(ks), n_features[i + 1])
        params['blocks'].append({'w': w, 'b': jnp.zeros((n_features[i + 1],)),
                                 'bn': bp})
        bn_states[f'block{i}'] = bs
    final_size = image_size // (2 ** n_layers)
    params['linear'] = _init_linear(next(ks), n_features[-1] * final_size ** 2, 1)
    meta = {'n_features': tuple(n_features), 'image_size': image_size,
            'final_size': final_size, 'n_colors': n_colors}
    return params, bn_states, meta


def discriminator_wgan(params, bn_states, x, meta, training=True, precision=None):
    y = conv2d_plain(x, params['conv0']['w'], params['conv0']['b'],
                     precision=precision)
    y = jnp.where(y >= 0, y, 0.2 * y)
    new_states = {}
    for i, blk in enumerate(params['blocks']):
        y = conv2d_plain(y, blk['w'], blk['b'], precision=precision)
        y, new_states[f'block{i}'] = batch_norm(y, blk['bn'],
                                                bn_states[f'block{i}'], training)
        y = jnp.where(y >= 0, y, 0.2 * y)
    # torch Flatten on NCHW: transpose back so the linear weights see the
    # same element order as the reference
    y = y.transpose(0, 3, 1, 2).reshape(y.shape[0], -1)
    return y @ params['linear']['w'] + params['linear']['b'], new_states


# --------------------------------------------------------------------------
# DCGAN nets (reference models.py:622-721)
# --------------------------------------------------------------------------

def init_generator_dcgan(key, n_features, latent_dim=512, n_colors=1):
    """7 stride-2 upsampling stages after a 4x4 stem: 4 -> 512."""
    assert len(n_features) == 7, 'dcgan generator expects 7 feature entries'
    ks = iter(jax.random.split(key, 2 * len(n_features) + 4))
    params = {'stem': {'w': _init_conv_w(next(ks), 4, 4, latent_dim, n_features[0])}}
    bp, bs = _init_bn(next(ks), n_features[0])
    params['stem']['bn'] = bp
    bn_states = {'stem': bs}
    params['blocks'] = []
    for i in range(len(n_features) - 1):
        w = _init_conv_w(next(ks), 4, 4, n_features[i], n_features[i + 1])
        bp, bs = _init_bn(next(ks), n_features[i + 1])
        params['blocks'].append({'w': w, 'bn': bp})
        bn_states[f'block{i}'] = bs
    params['final'] = {'w': _init_conv_w(next(ks), 4, 4, n_features[-1], n_colors)}
    meta = {'n_features': tuple(n_features), 'latent_dim': latent_dim,
            'n_colors': n_colors}
    return params, bn_states, meta


def generator_dcgan(params, bn_states, z, meta, training=True, precision=None):
    x = z.reshape(z.shape[0], 1, 1, meta['latent_dim'])
    x = conv_transpose2d(x, params['stem']['w'], stride=1, padding=0,
                         precision=precision)
    new_states = {}
    x, new_states['stem'] = batch_norm(x, params['stem']['bn'],
                                       bn_states['stem'], training)
    x = jnp.maximum(x, 0.0)
    for i, blk in enumerate(params['blocks']):
        x = conv_transpose2d(x, blk['w'], precision=precision)
        x, new_states[f'block{i}'] = batch_norm(x, blk['bn'],
                                                bn_states[f'block{i}'], training)
        x = jnp.maximum(x, 0.0)
    x = conv_transpose2d(x, params['final']['w'], precision=precision)
    return jnp.tanh(x), new_states


def init_discriminator_dcgan(key, n_features, n_colors=1):
    assert len(n_features) == 7, 'dcgan discriminator expects 7 feature entries'
    ks = iter(jax.random.split(key, 2 * len(n_features) + 4))
    params = {'conv0': {'w': _init_conv_w(next(ks), 4, 4, n_colors, n_features[0])}}
    bn_states = {}
    params['blocks'] = []
    for i in range(len(n_features) - 1):
        w = _init_conv_w(next(ks), 4, 4, n_features[i], n_features[i + 1])
        bp, bs = _init_bn(next(ks), n_features[i + 1])
        params['blocks'].append({'w': w, 'bn': bp})
        bn_states[f'block{i}'] = bs
    params['final'] = {'w': _init_conv_w(next(ks), 4, 4, n_features[-1], 1)}
    meta = {'n_features': tuple(n_features), 'n_colors': n_colors}
    return params, bn_states, meta


def discriminator_dcgan(params, bn_states, x, meta, training=True, precision=None):
    y = conv2d_plain(x, params['conv0']['w'], precision=precision)
    y = jnp.where(y >= 0, y, 0.2 * y)
    new_states = {}
    for i, blk in enumerate(params['blocks']):
        y = conv2d_plain(y, blk['w'], precision=precision)
        y, new_states[f'block{i}'] = batch_norm(y, blk['bn'],
                                                bn_states[f'block{i}'], training)
        y = jnp.where(y >= 0, y, 0.2 * y)
    y = conv2d_plain(y, params['final']['w'], stride=1, padding=0,
                     precision=precision)
    y = jax.nn.sigmoid(y)
    return y.reshape(y.shape[0], -1), new_states

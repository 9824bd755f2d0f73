"""Functional torch oracle for parity tests.

This encodes the reference's *documented architecture semantics*
(SURVEY.md §2.2: equalized-LR convs scale the INPUT by gain/sqrt(fan_in),
upsample = F.interpolate bilinear, downsample = AvgPool2d, PixelNorm over
channels, fade-in blend) directly with torch.nn.functional calls, taking the
same parameter pytree our JAX models use.  It exists solely so tests can
check numerics; it is not part of the framework.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

GAIN = torch.nn.init.calculate_gain('leaky_relu', 0.2)


def t(x):
    if isinstance(x, torch.Tensor):
        return x
    return torch.from_numpy(np.asarray(x))


def w_oihw(w_hwio):
    out = t(w_hwio).permute(3, 2, 0, 1)
    return out if out.requires_grad else out.contiguous()


def eq_conv(x, p, padding):
    w = w_oihw(p['w'])
    fan_in = w.shape[1] * w.shape[2] * w.shape[3]
    scale = GAIN / math.sqrt(fan_in)
    b = t(p['b']) if 'b' in p else None
    return F.conv2d(scale * x, w, b, padding=padding)


def plain_conv(x, p, padding=0):
    b = t(p['b']) if 'b' in p else None
    return F.conv2d(x, w_oihw(p['w']), b, padding=padding)


def eq_linear(x, p):
    w = t(p['w']).T.contiguous()  # (out, in)
    scale = GAIN / math.sqrt(w.shape[1])
    b = t(p['b']) if 'b' in p else None
    return F.linear(scale * x, w, b)


def pixel_norm(x):
    return x / torch.sqrt(torch.mean(x ** 2, dim=1, keepdim=True) + 1e-8)


def lrelu(x):
    return F.leaky_relu(x, 0.2)


def up2(x):
    return F.interpolate(x, scale_factor=2, mode='bilinear', align_corners=False)


def gen_block(x, p):
    x = up2(x)
    x = pixel_norm(lrelu(eq_conv(x, p['conv1'], 1)))
    x = pixel_norm(lrelu(eq_conv(x, p['conv2'], 1)))
    return x


def dis_block(x, p):
    x = F.avg_pool2d(x, 2)
    x = pixel_norm(lrelu(eq_conv(x, p['conv1'], 1)))
    x = pixel_norm(lrelu(eq_conv(x, p['conv2'], 1)))
    return x


def to_rgb(x, p):
    return torch.tanh(plain_conv(x, p))


def generator_forward(params, z, cfg, phase, alpha=None):
    """NCHW torch mirror of neuron_gan_tpu.models.generator_pg."""
    init = cfg.image_size_init
    f0 = cfg.n_gen_features[0]
    x = eq_linear(t(z), params['stem']['linear'])
    x = x.reshape(-1, f0, init, init)
    x = pixel_norm(lrelu(x))
    x = pixel_norm(lrelu(eq_conv(x, params['stem']['conv'], 1)))
    if alpha is None:
        for i in range(phase):
            x = gen_block(x, params['blocks'][i])
        return to_rgb(x, params['to_rgb'][phase])
    for i in range(phase - 1):
        x = gen_block(x, params['blocks'][i])
    im_start = up2(to_rgb(x, params['to_rgb'][phase - 1]))
    im_end = to_rgb(gen_block(x, params['blocks'][phase - 1]),
                    params['to_rgb'][phase])
    return im_start + alpha * (im_end - im_start)


def discriminator_forward(params, x, cfg, phase, alpha=None):
    """NCHW torch mirror of neuron_gan_tpu.models.discriminator_pg."""
    L = cfg.n_layers_max
    x = t(x)

    def head(y):
        y = pixel_norm(lrelu(eq_conv(y, params['head']['conv'], 1)))
        y = eq_conv(y, params['head']['conv_out'], 0)
        return y.reshape(y.shape[0], -1)

    if alpha is None:
        y = plain_conv(x, params['from_rgb'][L - 1 - phase])
        for i in range(L - 1 - phase, L - 1):
            y = dis_block(y, params['blocks'][i])
        return head(y)
    y_start = plain_conv(F.avg_pool2d(x, 2), params['from_rgb'][L - phase])
    y_end = dis_block(plain_conv(x, params['from_rgb'][L - 1 - phase]),
                      params['blocks'][L - 1 - phase])
    y = y_start + alpha * (y_end - y_start)
    for i in range(L - phase, L - 1):
        y = dis_block(y, params['blocks'][i])
    return head(y)

"""Parity tests for the ops layer against torch/torchvision numerics.

The torch expressions here are the *library semantics* the reference relies
on (F.interpolate, AvgPool2d, torchvision Resize, kaiming gain + input
scaling); they validate that the TPU-native ops reproduce them.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from neuron_gan_tpu import ops


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def nhwc(x_torch):
    return x_torch.detach().permute(0, 2, 3, 1).numpy()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_upsample2_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    got = np.asarray(ops.upsample2_bilinear(jnp.asarray(x)))
    want = nhwc(F.interpolate(nchw(x), scale_factor=2, mode='bilinear', align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_downsample2_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    got = np.asarray(ops.downsample2_bilinear(jnp.asarray(x)))
    want = nhwc(F.interpolate(nchw(x), scale_factor=0.5, mode='bilinear', align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('k', [2, 4])
def test_avg_pool_matches_torch(rng, k):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(ops.avg_pool(jnp.asarray(x), k))
    want = nhwc(torch.nn.AvgPool2d(kernel_size=k)(nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('out_size', [16, 32, 100, 250])
def test_resize_antialias_downscale_matches_torchvision(rng, out_size):
    # torchvision Resize(size, antialias=True) on tensors delegates to
    # F.interpolate(..., mode='bilinear', antialias=True).
    x = rng.random((1, 512, 512, 1)).astype(np.float32)
    got = np.asarray(ops.resize_antialias(jnp.asarray(x), out_size))
    want = nhwc(F.interpolate(nchw(x), size=(out_size, out_size), mode='bilinear',
                              align_corners=False, antialias=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_resize_antialias_upscale_matches_torchvision(rng):
    x = rng.random((1, 16, 16, 1)).astype(np.float32)
    got = np.asarray(ops.resize_antialias(jnp.asarray(x), 48))
    want = nhwc(F.interpolate(nchw(x), size=(48, 48), mode='bilinear',
                              align_corners=False, antialias=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('out_size', [16, 512])
def test_resize_nearest_matches_torch(rng, out_size):
    x = rng.standard_normal((2, 48, 48, 1)).astype(np.float32)
    got = np.asarray(ops.resize_nearest(jnp.asarray(x), out_size))
    want = nhwc(F.interpolate(nchw(x), size=(out_size, out_size), mode='nearest'))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_gain_matches_torch():
    assert ops.calculate_gain('leaky_relu', 0.2) == pytest.approx(
        torch.nn.init.calculate_gain('leaky_relu', 0.2))
    assert ops.calculate_gain('linear') == pytest.approx(
        torch.nn.init.calculate_gain('linear'))


def test_equalized_conv2d_matches_torch_input_scaling(rng):
    # Reference semantics: y = conv(w, scale*x) + b with
    # scale = gain/sqrt(fan_in) (models.py:186-204).
    c_in, c_out, k = 5, 7, 3
    x = rng.standard_normal((2, 8, 8, c_in)).astype(np.float32)
    w_oihw = rng.standard_normal((c_out, c_in, k, k)).astype(np.float32)
    b = rng.standard_normal((c_out,)).astype(np.float32)

    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    got = np.asarray(ops.equalized_conv2d(
        jnp.asarray(x), {'w': jnp.asarray(w_hwio), 'b': jnp.asarray(b)},
        padding=1, precision=jax.lax.Precision.HIGHEST))

    scale = torch.nn.init.calculate_gain('leaky_relu', 0.2) / np.sqrt(c_in * k * k)
    want = nhwc(F.conv2d(scale * nchw(x), torch.from_numpy(w_oihw),
                         torch.from_numpy(b), padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_equalized_linear_matches_torch_input_scaling(rng):
    d_in, d_out = 11, 6
    x = rng.standard_normal((4, d_in)).astype(np.float32)
    w = rng.standard_normal((d_out, d_in)).astype(np.float32)  # torch layout
    b = rng.standard_normal((d_out,)).astype(np.float32)

    got = np.asarray(ops.equalized_linear(
        jnp.asarray(x), {'w': jnp.asarray(w.T), 'b': jnp.asarray(b)},
        precision=jax.lax.Precision.HIGHEST))

    scale = torch.nn.init.calculate_gain('leaky_relu', 0.2) / np.sqrt(d_in)
    want = F.linear(scale * torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pixel_norm_matches_reference_formula(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    got = np.asarray(ops.pixel_norm(jnp.asarray(x)))
    xt = nchw(x)
    want = nhwc(xt / torch.sqrt(torch.mean(xt ** 2, dim=1, keepdim=True) + 1e-8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_leaky_relu(rng):
    x = rng.standard_normal((16,)).astype(np.float32)
    got = np.asarray(ops.leaky_relu(jnp.asarray(x), 0.2))
    want = F.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_fade_in_blend():
    a = jnp.ones((2, 2)) * 2.0
    b = jnp.ones((2, 2)) * 6.0
    np.testing.assert_allclose(np.asarray(ops.fade_in(a, b, 0.25)), 3.0)


def test_init_std_matches_kaiming():
    key = jax.random.PRNGKey(0)
    p = ops.init_conv2d(key, 64, 128, 3, bias=True)
    fan_in = 64 * 9
    want_std = ops.calculate_gain('leaky_relu', 0.2) / np.sqrt(fan_in)
    assert np.asarray(p['w']).std() == pytest.approx(want_std, rel=0.02)
    assert np.all(np.asarray(p['b']) == 0)

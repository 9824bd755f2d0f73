import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from neuron_gan_tpu.models.legacy import (
    conv_transpose2d, batch_norm,
    init_generator_wgan, generator_wgan,
    init_discriminator_wgan, discriminator_wgan,
    init_generator_dcgan, generator_dcgan,
    init_discriminator_dcgan, discriminator_dcgan,
)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    w = rng.standard_normal((3, 4, 4, 4)).astype(np.float32)  # torch (in,out,kh,kw)
    b = rng.standard_normal((4,)).astype(np.float32)
    got = np.asarray(conv_transpose2d(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 0, 1))),
        jnp.asarray(b), stride=2, padding=1,
        precision=jax.lax.Precision.HIGHEST))
    want = F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                              torch.from_numpy(w), torch.from_numpy(b),
                              stride=2, padding=1)
    want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (2, 10, 10, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_transpose_stride1_padding0():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 1, 6)).astype(np.float32)
    w = rng.standard_normal((6, 5, 4, 4)).astype(np.float32)
    got = np.asarray(conv_transpose2d(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 0, 1))),
        stride=1, padding=0, precision=jax.lax.Precision.HIGHEST))
    want = F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                              torch.from_numpy(w), stride=1, padding=0)
    want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == (1, 4, 4, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batch_norm_matches_torch_train_and_eval():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 6, 6, 3)).astype(np.float32)
    params = {'scale': jnp.asarray([1.2, 0.8, 1.0]),
              'bias': jnp.asarray([0.1, -0.2, 0.0])}
    state = {'mean': jnp.zeros(3), 'var': jnp.ones(3)}

    bn = torch.nn.BatchNorm2d(3)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor([1.2, 0.8, 1.0]))
        bn.bias.copy_(torch.tensor([0.1, -0.2, 0.0]))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)

    got, new_state = batch_norm(jnp.asarray(x), params, state, training=True)
    want = bn(xt).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state['mean']),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state['var']),
                               bn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    bn.eval()
    got_eval, _ = batch_norm(jnp.asarray(x), params, new_state, training=False)
    want_eval = bn(xt).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got_eval), want_eval,
                               rtol=1e-4, atol=1e-5)


def test_wgan_nets_shapes():
    feats = [32, 16]
    gp, gbn, gmeta = init_generator_wgan(jax.random.PRNGKey(0), feats,
                                         latent_dim=8, image_size=16)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)),
                    dtype=jnp.float32)
    out, new_bn = generator_wgan(gp, gbn, z, gmeta)
    assert out.shape == (2, 16, 16, 1)
    assert np.abs(np.asarray(out)).max() <= 1.0

    dp, dbn, dmeta = init_discriminator_wgan(jax.random.PRNGKey(1), feats,
                                             image_size=16)
    scores, _ = discriminator_wgan(dp, dbn, out, dmeta)
    assert scores.shape == (2, 1)


def test_dcgan_nets_shapes():
    feats = [64, 32, 16, 16, 8, 8, 8]
    gp, gbn, gmeta = init_generator_dcgan(jax.random.PRNGKey(0), feats,
                                          latent_dim=16)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16)),
                    dtype=jnp.float32)
    out, _ = generator_dcgan(gp, gbn, z, gmeta)
    assert out.shape == (2, 512, 512, 1)

    dp, dbn, dmeta = init_discriminator_dcgan(jax.random.PRNGKey(1), feats)
    scores, _ = discriminator_dcgan(dp, dbn, out, dmeta)
    assert scores.shape == (2, 1)
    s = np.asarray(scores)
    assert (s >= 0).all() and (s <= 1).all()  # sigmoid output

"""Loss parity vs torch, including the WGAN-GP double-backward path."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neuron_gan_tpu.losses import (
    d_w_loss, g_w_loss, d_grad_pen_loss, similarity_loss, d_ls_loss, g_ls_loss)
from neuron_gan_tpu.models import (
    PGConfig, init_generator_pg, init_discriminator_pg,
    generator_pg, discriminator_pg)
import torch_mirror


CFG = PGConfig(n_gen_features=(16, 8, 8), n_dis_features=(8, 8, 16),
               latent_dim=12, image_size_init=4, precision='highest')
PHASE = 1
RES = CFG.resolution(PHASE)


@pytest.fixture(scope='module')
def setup():
    kg, kd, kx, kz, ke = jax.random.split(jax.random.PRNGKey(0), 5)
    g = jax.tree.map(np.asarray, init_generator_pg(kg, CFG))
    d = jax.tree.map(np.asarray, init_discriminator_pg(kd, CFG))
    real = np.asarray(jax.random.normal(kx, (4, RES, RES, 1)), dtype=np.float32)
    z = np.asarray(jax.random.normal(kz, (4, CFG.latent_dim)), dtype=np.float32)
    eps = np.asarray(jax.random.uniform(ke, (4,)), dtype=np.float32)
    return g, d, real, z, eps


def g_apply(p, z):
    return generator_pg(p, z, CFG, PHASE)


def d_apply(p, x):
    return discriminator_pg(p, x, CFG, PHASE)


def test_d_w_loss_matches_torch(setup):
    g, d, real, z, _ = setup
    loss, (sr, sf) = d_w_loss(d_apply, g_apply, d, g, jnp.asarray(real),
                              jnp.asarray(z), drift_epsilon=0.001)
    real_t = torch.from_numpy(np.transpose(real, (0, 3, 1, 2)))
    scores_r = torch_mirror.discriminator_forward(d, real_t.numpy(), CFG, PHASE)
    fake = torch_mirror.generator_forward(g, z, CFG, PHASE)
    scores_f = torch_mirror.discriminator_forward(d, fake.numpy(), CFG, PHASE)
    want = (-scores_r.mean() + scores_f.mean()
            + 0.001 * scores_r.pow(2).mean()).item()
    assert float(loss) == pytest.approx(want, rel=1e-4, abs=1e-5)
    assert float(sr) == pytest.approx(scores_r.mean().item(), rel=1e-4, abs=1e-5)


def test_g_w_loss_matches_torch(setup):
    g, d, real, z, _ = setup
    loss, _ = g_w_loss(g_apply, d_apply, g, d, jnp.asarray(z))
    fake = torch_mirror.generator_forward(g, z, CFG, PHASE)
    want = -torch_mirror.discriminator_forward(d, fake.numpy(), CFG, PHASE).mean().item()
    assert float(loss) == pytest.approx(want, rel=1e-4, abs=1e-5)


def _torch_gp(d, real_nchw, fake_nchw, eps, lam):
    """Reference GP semantics via torch autograd (loss_functions.py:157-180)."""
    eps_t = torch.from_numpy(eps).reshape(-1, 1, 1, 1)
    x_hat = (eps_t * torch.from_numpy(real_nchw)
             + (1 - eps_t) * torch.from_numpy(fake_nchw)).requires_grad_()
    out = _torch_d_forward_differentiable(d, x_hat)
    grad = torch.autograd.grad(out.sum(), x_hat, create_graph=True)[0]
    return lam * ((grad.norm(2, dim=(1, 2, 3)) - 1) ** 2).mean()


def _torch_d_forward_differentiable(params, x):
    """torch_mirror.discriminator_forward but taking a live torch tensor."""
    import torch.nn.functional as F
    L = CFG.n_layers_max
    y = F.conv2d(x, torch_mirror.w_oihw(params['from_rgb'][L - 1 - PHASE]['w']),
                 torch_mirror.t(params['from_rgb'][L - 1 - PHASE]['b']))
    for i in range(L - 1 - PHASE, L - 1):
        y = torch_mirror.dis_block(y, params['blocks'][i])
    y = torch_mirror.pixel_norm(torch_mirror.lrelu(
        torch_mirror.eq_conv(y, params['head']['conv'], 1)))
    y = torch_mirror.eq_conv(y, params['head']['conv_out'], 0)
    return y.reshape(y.shape[0], -1)


def test_grad_penalty_value_matches_torch(setup):
    g, d, real, z, eps = setup
    fake = np.asarray(g_apply(g, jnp.asarray(z)))
    got = d_grad_pen_loss(d_apply, d, jnp.asarray(real), jnp.asarray(fake),
                          jnp.asarray(eps), gp_lambda=10.0)
    want = _torch_gp(d, np.transpose(real, (0, 3, 1, 2)),
                     np.transpose(fake, (0, 3, 1, 2)), eps, 10.0)
    assert float(got) == pytest.approx(want.item(), rel=2e-3, abs=1e-4)


def test_grad_penalty_double_backward_matches_torch(setup):
    """d(GP)/d(d_params) — the create_graph=True path — must match torch."""
    g, d, real, z, eps = setup
    fake = np.asarray(g_apply(g, jnp.asarray(z)))

    jax_grads = jax.grad(lambda dp: d_grad_pen_loss(
        d_apply, dp, jnp.asarray(real), jnp.asarray(fake), jnp.asarray(eps),
        10.0))(d)

    # torch side: parameters as leaf tensors
    d_t = jax.tree.map(lambda a: torch.from_numpy(np.ascontiguousarray(a))
                       .requires_grad_(), d)
    gp = _torch_gp(d_t, np.transpose(real, (0, 3, 1, 2)),
                   np.transpose(fake, (0, 3, 1, 2)), eps, 10.0)
    gp.backward()

    # compare a few representative leaves
    pairs = [
        (jax_grads['head']['conv']['w'], d_t['head']['conv']['w'].grad),
        (jax_grads['head']['conv_out']['b'], d_t['head']['conv_out']['b'].grad),
        (jax_grads['from_rgb'][CFG.n_layers_max - 1 - PHASE]['w'],
         d_t['from_rgb'][CFG.n_layers_max - 1 - PHASE]['w'].grad),
        (jax_grads['blocks'][CFG.n_layers_max - 1 - PHASE]['conv1']['w'],
         d_t['blocks'][CFG.n_layers_max - 1 - PHASE]['conv1']['w'].grad),
    ]
    for jg, tg in pairs:
        jg = np.asarray(jg)
        # GP doesn't depend on the final conv bias: torch reports None where
        # jax reports exact zeros
        tgn = np.zeros_like(jg) if tg is None else tg.numpy()
        np.testing.assert_allclose(jg, tgn, rtol=5e-3, atol=1e-5)


def test_grad_penalty_zero_lambda(setup):
    g, d, real, z, eps = setup
    got = d_grad_pen_loss(d_apply, d, jnp.asarray(real), jnp.asarray(real),
                          jnp.asarray(eps), gp_lambda=0.0)
    assert float(got) == 0.0


def test_similarity_loss_matches_torch(setup):
    _, _, real, z, _ = setup
    got = similarity_loss(jnp.asarray(real), jnp.asarray(z), 0.5)
    b = real.shape[0]
    im = torch.from_numpy(real.reshape(b, -1))
    zm = torch.from_numpy(z.reshape(b, -1))
    im = im / im.norm(2, dim=1, keepdim=True)
    zm = zm / zm.norm(2, dim=1, keepdim=True)
    want = 0.5 * (zm @ zm.T - im @ im.T).pow(2).sum() / (b * (b - 1))
    assert float(got) == pytest.approx(want.item(), rel=1e-4, abs=1e-6)


def test_ls_losses(setup):
    g, d, real, z, _ = setup
    dl, (sr, sf) = d_ls_loss(d_apply, g_apply, d, g, jnp.asarray(real),
                             jnp.asarray(z))
    gl, _ = g_ls_loss(g_apply, d_apply, g, d, jnp.asarray(z))
    real_t = np.transpose(real, (0, 3, 1, 2))
    scores_r = torch_mirror.discriminator_forward(d, real_t, CFG, PHASE)
    fake = torch_mirror.generator_forward(g, z, CFG, PHASE)
    scores_f = torch_mirror.discriminator_forward(d, fake.numpy(), CFG, PHASE)
    want_d = ((scores_r - 1) ** 2).mean() + (scores_f ** 2).mean()
    want_g = ((scores_f - 1) ** 2).mean()
    assert float(dl) == pytest.approx(want_d.item(), rel=1e-4, abs=1e-5)
    assert float(gl) == pytest.approx(want_g.item(), rel=1e-4, abs=1e-5)


def test_grad_penalty_remat_matches(setup):
    """gp_remat rematerializes D(x_hat) in the double-backward — the math
    is a replay of the same ops, so value AND d(GP)/d(d_params) must match
    the non-remat path to float-reorder tolerance."""
    g, d, real, z, eps = setup
    fake = np.asarray(g_apply(g, jnp.asarray(z)))

    def gp(dp, remat):
        return d_grad_pen_loss(d_apply, dp, jnp.asarray(real),
                               jnp.asarray(fake), jnp.asarray(eps),
                               10.0, remat=remat)

    assert float(gp(d, True)) == pytest.approx(float(gp(d, False)),
                                               rel=1e-6, abs=1e-7)
    want = jax.grad(lambda dp: gp(dp, False))(d)
    got = jax.grad(lambda dp: gp(dp, True))(d)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

"""GAN loss functions (functional, jit/grad-composable).

Parity map to the reference (loss_functions.py):

* ``d_w_loss``     — Wasserstein critic loss ``-<D(x)> + <D(G(z))>`` with
  fakes detached (stop_gradient), plus the drift term
  ``eps * <D(x)^2>`` on the *real* scores only (:7-47).
* ``g_w_loss``     — ``-<D(G(z))>`` (:51-74).
* ``d_grad_pen_loss`` — WGAN-GP: per-sample uniform interpolation between
  real and detached fake images, then ``lambda * <(||dD/dx_hat||_2 - 1)^2>``
  with the norm over (H, W, C) (:148-180).  The create_graph=True
  double-backward of the reference is expressed as ``jax.grad`` *inside* a
  loss that is itself differentiated — XLA composes the grad-of-grad
  natively.
* ``similarity_loss`` — cosine-similarity matching between latents and
  flattened images (:185-205).
* ``d_ls_loss`` / ``g_ls_loss`` — LSGAN losses, implemented-but-unused in the
  reference (:79-143); kept for capability parity.

NaN handling: the reference checks every loss for NaN inline and pickles all
locals before raising (loss_functions.py:35-41).  Branching on traced values
inside jit is not possible (and a per-step host sync would stall the TPU
pipeline), so the equivalent guard lives in the training driver: returned
per-epoch stats are checked on the host at monitoring cadence and dumped via
``utils.crashdump.save_vars`` before raising (see train.py).
"""

import jax
import jax.numpy as jnp


def d_w_loss(d_apply, g_apply, d_params, g_params, real_images, z,
             drift_epsilon=0.0):
    """Critic Wasserstein loss. Returns (loss, (score_real, score_fake)).

    Score reductions run in float32 regardless of the model compute dtype so
    the bfloat16 fast path keeps full-precision loss statistics.
    """
    real_scores = d_apply(d_params, real_images).astype(jnp.float32)
    score_real = jnp.mean(real_scores)

    fake_images = jax.lax.stop_gradient(g_apply(g_params, z))
    score_fake = jnp.mean(d_apply(d_params, fake_images).astype(jnp.float32))

    loss = -score_real + score_fake
    if drift_epsilon > 0:
        loss = loss + drift_epsilon * jnp.mean(jnp.square(real_scores))
    return loss, (score_real, score_fake)


def g_w_loss(g_apply, d_apply, g_params, d_params, z):
    """Generator Wasserstein loss. Returns (loss, z)."""
    fake_images = g_apply(g_params, z)
    loss = -jnp.mean(d_apply(d_params, fake_images).astype(jnp.float32))
    return loss, z


def d_grad_pen_loss(d_apply, d_params, real_images, fake_images, epsilon,
                    gp_lambda, remat=False):
    """Gradient penalty on interpolates.

    ``epsilon`` is a (B,) or (B,1,1,1) uniform sample; ``fake_images`` should
    already be detached from the generator (the caller stop_gradients them,
    mirroring reference loss_functions.py:167).

    ``remat`` wraps the critic forward in ``jax.checkpoint`` so the outer
    (double-)backward recomputes D(x_hat)'s activations instead of keeping
    them live — float-identical math, memory/bandwidth vs FLOPs trade.
    """
    if gp_lambda <= 0:
        return jnp.zeros((), real_images.dtype)
    eps = epsilon.reshape(epsilon.shape[0], 1, 1, 1).astype(real_images.dtype)
    x_hat = eps * real_images + (1.0 - eps) * fake_images

    score = lambda xh: jnp.sum(d_apply(d_params, xh))
    if remat:
        score = jax.checkpoint(score)
    grad = jax.grad(score)(x_hat)
    grad = grad.astype(jnp.float32)  # f32 accumulation for the norm reduction
    norms = jnp.sqrt(jnp.sum(jnp.square(grad), axis=(1, 2, 3)))
    return gp_lambda * jnp.mean(jnp.square(norms - 1.0))


def similarity_loss(images, z, sim_lambda=1.0):
    """Anti-mode-collapse cosine-similarity matching (loss_functions.py:185-205)."""
    b = images.shape[0]
    im = images.reshape(b, -1)
    zm = z.reshape(b, -1)
    im = im / jnp.linalg.norm(im, axis=1, keepdims=True)
    zm = zm / jnp.linalg.norm(zm, axis=1, keepdims=True)
    z_cos = zm @ zm.T
    im_cos = im @ im.T
    n_pairs = b * (b - 1)
    return sim_lambda * jnp.sum(jnp.square(z_cos - im_cos)) / n_pairs


def d_ls_loss(d_apply, g_apply, d_params, g_params, real_images, z):
    """LSGAN critic loss ``<(D(x)-1)^2> + <D(G(z))^2>`` (loss_functions.py:79-112)."""
    real_scores = d_apply(d_params, real_images)
    fake_images = jax.lax.stop_gradient(g_apply(g_params, z))
    fake_scores = d_apply(d_params, fake_images)
    loss = jnp.mean(jnp.square(real_scores - 1.0)) + jnp.mean(jnp.square(fake_scores))
    return loss, (jnp.mean(real_scores), jnp.mean(fake_scores))


def g_ls_loss(g_apply, d_apply, g_params, d_params, z):
    """LSGAN generator loss ``<(D(G(z))-1)^2>`` (loss_functions.py:117-143)."""
    fake_scores = d_apply(d_params, g_apply(g_params, z))
    return jnp.mean(jnp.square(fake_scores - 1.0)), jnp.mean(fake_scores)

"""Legacy fixed-resolution WGAN training path (reference train.py:454-537).

Invoked by train.py when ``--wgan`` / ``config.wgan`` is set.  Semantics:
per batch, N_D critic updates (Wasserstein loss + drift, Adam/RMSprop step,
then *all* critic parameters clamped to [-0.01, 0.01] for the Lipschitz
condition, train.py:486-487), then one generator update with optional
(non-decaying) similarity loss; constant learning rate (the reference's LR
scheduler only runs in the PGGAN path); epoch stats are accumulated as plain
sums over batches (the reference never normalizes them in this path).

BatchNorm runs in training mode throughout, with running statistics updated
on every discriminator/generator forward in the same order as the
reference's module calls (real-batch forward, then fake-batch forward).
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from neuron_gan_tpu.checkpoint import Checkpointer
from neuron_gan_tpu.data.augment import AugmentSpec, augment_batch
from neuron_gan_tpu.losses import similarity_loss
from neuron_gan_tpu.models.legacy import (
    init_generator_wgan, init_discriminator_wgan,
    generator_wgan, discriminator_wgan)
from neuron_gan_tpu.train_step import make_optimizer, _apply_update
from neuron_gan_tpu.utils.latents import sample_latent_vec
from neuron_gan_tpu.utils.monitor import calculate_d_steps
from neuron_gan_tpu.utils.plotting import plot_scores, save_image_grid

FILENAME_FORMAT = '{prefix}_{ID}.{ext}'


def make_wgan_epoch_runner(g_meta, d_meta, *, n_critic, batch_size, n_images,
                           latent_dim, drift_epsilon, sim_lambda, lr, beta1,
                           rmsprop, crop_size, out_size, translation, clamp=0.01):
    opt = make_optimizer(beta1, rmsprop)
    n_full = n_images // batch_size
    remainder = n_images % batch_size
    aug_spec = AugmentSpec(crop_size=crop_size, out_size=out_size,
                           translation=translation, augment=True)

    def batch_body(carry, inp):
        state, = (carry,)
        raw, kb = inp
        images = augment_batch(raw, jax.random.fold_in(kb, 0), aug_spec)

        b = raw.shape[0]  # static; = batch_size except the final partial batch
        sr = sf = d_loss_val = jnp.zeros(())
        for j in range(n_critic):
            kj = jax.random.fold_in(kb, 1 + j)
            z = sample_latent_vec(kj, (b, latent_dim))

            def d_loss_fn(d_params, d_bn):
                real_scores, bn1 = discriminator_wgan(d_params, d_bn, images,
                                                      d_meta, training=True)
                # the generator runs in train mode here like the reference
                # (its D_W_loss forwards G without eval(), so G's BatchNorm
                # running stats advance on every critic step too) — carry
                # the updated G BN state out instead of discarding it
                fake, g_bn_new = generator_wgan(state['g_params'],
                                                state['g_bn'], z,
                                                g_meta, training=True)
                fake = jax.lax.stop_gradient(fake)
                fake_scores, bn2 = discriminator_wgan(d_params, bn1, fake,
                                                      d_meta, training=True)
                s_r = jnp.mean(real_scores)
                s_f = jnp.mean(fake_scores)
                loss = -s_r + s_f
                if drift_epsilon > 0:
                    loss = loss + drift_epsilon * jnp.mean(jnp.square(real_scores))
                return loss, (s_r, s_f, bn2, g_bn_new)

            (d_loss_val, (sr, sf, new_bn, new_gbn)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state['d_params'], state['d_bn'])
            d_params, d_opt = _apply_update(state['d_params'], state['d_opt'],
                                            d_grads, opt, lr)
            # Lipschitz clamp on every critic parameter (train.py:486-487)
            d_params = jax.tree.map(lambda p: jnp.clip(p, -clamp, clamp), d_params)
            state = {**state, 'd_params': d_params, 'd_opt': d_opt,
                     'd_bn': new_bn, 'g_bn': new_gbn}

        kg = jax.random.fold_in(kb, 101)
        zg = sample_latent_vec(kg, (b, latent_dim))

        def g_loss_fn(g_params, g_bn):
            fake, new_gbn = generator_wgan(g_params, g_bn, zg, g_meta,
                                           training=True)
            scores, new_dbn = discriminator_wgan(state['d_params'],
                                                 state['d_bn'], fake, d_meta,
                                                 training=True)
            loss = -jnp.mean(scores)
            if sim_lambda > 0:
                loss = loss + similarity_loss(images, zg, sim_lambda)
            return loss, (new_gbn, new_dbn)

        (g_loss_val, (new_gbn, new_dbn)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state['g_params'], state['g_bn'])
        g_params, g_opt = _apply_update(state['g_params'], state['g_opt'],
                                        g_grads, opt, lr)
        state = {**state, 'g_params': g_params, 'g_opt': g_opt,
                 'g_bn': new_gbn, 'd_bn': new_dbn}
        return state, jnp.stack([sr, sf, d_loss_val, g_loss_val])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state, images_stack, key):
        perm = jax.random.permutation(jax.random.fold_in(key, 7), n_images)
        shuffled = jnp.take(images_stack, perm, axis=0)
        n_steps = n_full + (1 if remainder else 0)
        bkeys = jax.random.split(jax.random.fold_in(key, 11), n_steps)
        batches = shuffled[:n_full * batch_size].reshape(
            n_full, batch_size, *images_stack.shape[1:])
        state, stats = jax.lax.scan(batch_body, state,
                                    (batches, bkeys[:n_full]))
        total = jnp.sum(stats, axis=0)  # reference keeps raw sums
        if remainder:  # drop_last=False: train the final partial batch too
            state, rem_stats = batch_body(
                state, (shuffled[n_full * batch_size:], bkeys[n_full]))
            total = total + rem_stats
        return state, total

    return run_epoch


def wgan_train(config, dataset, mesh=None):
    if mesh is not None:
        # the legacy fixed-resolution WGAN path is deliberately
        # single-device (like the reference, SURVEY.md §2.3); say so
        # instead of silently idling the other chips
        print('wgan path: mesh_shape is ignored — legacy WGAN trains '
              'single-device; use the PGGAN path for data/model parallelism')
    key = jax.random.PRNGKey(config.seed)
    kg, kd, keval = jax.random.split(key, 3)
    g_params, g_bn, g_meta = init_generator_wgan(
        kg, config.N_gen_features, latent_dim=config.latent_dim,
        image_size=config.image_size, n_colors=config.N_colors)
    d_params, d_bn, d_meta = init_discriminator_wgan(
        kd, config.N_dis_features, image_size=config.image_size,
        n_colors=config.N_colors)
    opt = make_optimizer(config.beta1, config.RMSprop)
    state = {'g_params': g_params, 'd_params': d_params,
             'g_bn': g_bn, 'd_bn': d_bn,
             'g_opt': opt.init(g_params), 'd_opt': opt.init(d_params)}

    train_state_filename = os.path.join(
        config.weights_dir,
        FILENAME_FORMAT.format(prefix='GenDisc', ID=config.ID, ext='npz'))
    checkpoint = Checkpointer(train_state_filename, n_epochs=config.N_epochs,
                              extra_checkpoint_period=1e3)
    if config.resume and os.path.exists(train_state_filename):
        state, _ = checkpoint.load_state()

    images_stack = jnp.asarray(dataset.images)
    eval_noise = sample_latent_vec(keval, (16, config.latent_dim))
    training_summary_filename = os.path.join(
        config.plots_dir, 'Training_summary_{}.png'.format(config.ID))

    runner = None
    n_critic = config.n_critic
    epoch_init = checkpoint.epoch + 1
    for epoch in range(epoch_init, config.N_epochs + 1):
        if config.adapt_critic:
            n_c = calculate_d_steps(checkpoint.loss_real[:epoch - 1],
                                    checkpoint.loss_fake[:epoch - 1],
                                    1, config.n_critic, 10)
        else:
            n_c = config.n_critic
        if runner is None or n_c != n_critic:
            n_critic = n_c
            runner = make_wgan_epoch_runner(
                g_meta, d_meta, n_critic=n_critic,
                batch_size=config.batch_size, n_images=len(dataset),
                latent_dim=config.latent_dim,
                drift_epsilon=config.drift_epsilon,
                sim_lambda=config.sim_loss_lambda,
                lr=config.learning_rate, beta1=config.beta1,
                rmsprop=config.RMSprop, crop_size=dataset.image_size_max,
                out_size=dataset.image_size_max,
                translation=config.translation)
        state, stats = runner(state, images_stack,
                              jax.random.fold_in(jax.random.PRNGKey(config.seed + 977),
                                                 epoch))
        stats = np.asarray(jax.device_get(stats))
        print('Epoch: %d, N_D_steps: %d | Loss_real (<D(x)>_x): %.4f, '
              'Loss_fake (<D(G(z))>): %.4f, G_loss: %.4f, D_loss: %.4f'
              % (epoch, n_critic, stats[0], stats[1], stats[3], stats[2]))

        checkpoint.loss_real[epoch - 1] = stats[0]
        checkpoint.loss_fake[epoch - 1] = stats[1]
        checkpoint.loss_d[epoch - 1] = stats[2]
        checkpoint.loss_g[epoch - 1] = stats[3]

        if epoch % config.checkpointing_period == 0:
            host_state = jax.tree.map(np.asarray, state)
            checkpoint.save_state(epoch, host_state, meta={
                'family': 'wgan', 'lr': config.learning_rate,
                'image_size': config.image_size, 'alpha': 1.0, 'phase': 0,
                'ID': config.ID,
                'N_gen_features': list(config.N_gen_features),
                'N_dis_features': list(config.N_dis_features),
                'latent_dim': config.latent_dim})
            eval_fake, _ = generator_wgan(state['g_params'], state['g_bn'],
                                          eval_noise, g_meta, training=False)
            path = os.path.join(config.images_dir,
                                'Samples_{}_{:d}.png'.format(config.ID, epoch))
            save_image_grid(np.asarray(eval_fake), path, nrow=4, normalize=True)
            plot_scores(checkpoint.loss_real[:epoch],
                        checkpoint.loss_fake[:epoch],
                        training_summary_filename)

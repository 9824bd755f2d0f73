import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuron_gan_tpu.models import PGConfig, init_generator_pg, init_discriminator_pg
from neuron_gan_tpu.schedule import TrainSchedule, sim_lambda_at
from neuron_gan_tpu.train_step import (
    ChunkSpec, make_epoch_runner, make_optimizer, init_train_state,
    resolve_shear, STAT_NAMES,
)


CFG = PGConfig(n_gen_features=(16, 8, 8), n_dis_features=(8, 8, 16),
               latent_dim=12, image_size_init=4)


def make_state(beta1=0.5, rmsprop=False):
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = init_generator_pg(kg, CFG)
    d = init_discriminator_pg(kd, CFG)
    opt = make_optimizer(beta1, rmsprop)
    return init_train_state(g, d, opt)


def make_spec(**kw):
    base = dict(phase=0, fading=False, n_critic=1, batch_size=2, n_images=4,
                shuffle=True, crop_size=16, translation=0.05, augment=True,
                gp_lambda=10.0, drift_epsilon=0.001, sim_lambda0=0.0,
                sim_decay=0.0, beta1=0.5, rmsprop=False, lr0=1e-3,
                lr_gamma=0.99, lr_boundary=0, lr_cap=50, alpha_start=0,
                alpha_step=0.25, latent_dim=CFG.latent_dim)
    base.update(kw)
    return ChunkSpec(**base)


@pytest.fixture(scope='module')
def images_stack():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((4, 24, 24, 1)).astype(np.float32))


def test_epoch_runner_runs_and_learns(images_stack):
    state = make_state()
    run = make_epoch_runner(CFG, make_spec(), n_epochs=2, donate=False)
    new_state, stats = run(state, images_stack, jax.random.PRNGKey(1), 1)
    stats = np.asarray(stats)
    assert stats.shape == (2, len(STAT_NAMES))
    assert np.isfinite(stats).all()
    # both nets actually updated
    w0 = np.asarray(state['g_params']['stem']['conv']['w'])
    w1 = np.asarray(new_state['g_params']['stem']['conv']['w'])
    assert not np.allclose(w0, w1)
    d0 = np.asarray(state['d_params']['head']['conv']['w'])
    d1 = np.asarray(new_state['d_params']['head']['conv']['w'])
    assert not np.allclose(d0, d1)


def test_epoch_runner_fading_phase(images_stack):
    state = make_state()
    spec = make_spec(phase=1, fading=True, alpha_start=1, alpha_step=0.25)
    run = make_epoch_runner(CFG, spec, n_epochs=2, donate=False)
    new_state, stats = run(state, images_stack, jax.random.PRNGKey(2), 1)
    assert np.isfinite(np.asarray(stats)).all()


def test_epoch_runner_n_critic_zero_keeps_d_frozen(images_stack):
    state = make_state()
    run = make_epoch_runner(CFG, make_spec(n_critic=0), n_epochs=1, donate=False)
    new_state, stats = run(state, images_stack, jax.random.PRNGKey(3), 1)
    d0 = jax.tree.leaves(state['d_params'])
    d1 = jax.tree.leaves(new_state['d_params'])
    for a, b in zip(d0, d1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # stats still computed for monitoring
    assert np.isfinite(np.asarray(stats)).all()


def test_gp_lambda_zero_skips_penalty(images_stack):
    state = make_state()
    run = make_epoch_runner(CFG, make_spec(gp_lambda=0.0), n_epochs=1,
                            donate=False)
    _, stats = run(state, images_stack, jax.random.PRNGKey(4), 1)
    assert np.asarray(stats)[0, STAT_NAMES.index('D_grad_pen')] == 0.0


def test_gp_reuse_fakes_runs_and_matches_fresh_shape(images_stack):
    """gp_reuse_fakes feeds the critic-loss fake batch (z1) to the GP
    (original WGAN-GP formulation) — finite stats, both nets update, and
    the trajectory genuinely differs from the fresh-draw reference
    semantics (different GP interpolates)."""
    run_fresh = make_epoch_runner(CFG, make_spec(), n_epochs=1, donate=False)
    run_reuse = make_epoch_runner(CFG, make_spec(gp_reuse_fakes=True),
                                  n_epochs=1, donate=False)
    s_fresh, st_fresh = run_fresh(make_state(), images_stack,
                                  jax.random.PRNGKey(5), 1)
    s_reuse, st_reuse = run_reuse(make_state(), images_stack,
                                  jax.random.PRNGKey(5), 1)
    assert np.isfinite(np.asarray(st_fresh)).all()
    assert np.isfinite(np.asarray(st_reuse)).all()
    gp_i = STAT_NAMES.index('D_grad_pen')
    assert np.asarray(st_reuse)[0, gp_i] > 0.0
    # same key, different GP latents => different critic update
    d_fresh = np.asarray(s_fresh['d_params']['head']['conv']['w'])
    d_reuse = np.asarray(s_reuse['d_params']['head']['conv']['w'])
    assert not np.allclose(d_fresh, d_reuse)
    # critic-loss fakes use the same z1 in both modes, so score_fake sees
    # the same latents (values differ only through the updated critic)
    assert np.isfinite(np.asarray(st_fresh)[0, STAT_NAMES.index('score_fake')])


def test_lr_schedule_matches_reference_semantics():
    # schedule: transitions at 100, 200; N=300; per-phase halves = 50
    from neuron_gan_tpu.schedule import TrainSchedule
    lr_at = TrainSchedule(transit_sch=(100, 200), alpha_step=0.05,
                          n_epochs=300, checkpointing_period=100,
                          lr0=1e-4).lr_at
    assert lr_at(1) == 1e-4                      # boundary reset
    g = np.exp(np.log(1 / 100) / 50)
    assert lr_at(2) == pytest.approx(1e-4 * g)   # first decay step
    assert lr_at(51) == pytest.approx(1e-4 * g ** 50)
    assert lr_at(52) == pytest.approx(1e-4 * g ** 50)   # flat second half
    assert lr_at(100) == pytest.approx(1e-4 * g ** 50)
    assert lr_at(101) == 1e-4                    # reset at transition
    assert lr_at(102) == pytest.approx(1e-4 * g)


def test_alpha_schedule():
    sch = TrainSchedule(transit_sch=(100, 200), alpha_step=0.01,
                        n_epochs=400, checkpointing_period=100, lr0=1e-4)
    assert sch.alpha_at(50) == 1.0
    assert sch.alpha_at(100) == 0.0              # transition starts
    assert sch.alpha_at(150) == pytest.approx(0.5)
    assert sch.alpha_at(199) == pytest.approx(0.99)
    assert sch.alpha_at(200) == 0.0              # next transition
    assert sch.alpha_at(350) == 1.0


def test_overlapping_fades_rejected():
    # transitions closer than one fade length would mis-pair the active
    # fade with the newest phase; the reference rejects such configs
    # (configs/config.py:196-200) and so does TrainSchedule
    with pytest.raises(ValueError, match='fade'):
        TrainSchedule(transit_sch=(100, 150), alpha_step=0.01,
                      n_epochs=400, checkpointing_period=100, lr0=1e-4)


def test_sim_lambda_schedule():
    assert sim_lambda_at(10, 0.0, 0.1) == 0.0
    assert sim_lambda_at(1, 0.5, 0.0) == 0.5
    assert sim_lambda_at(2, 0.5, 0.1) == pytest.approx(0.45)
    assert sim_lambda_at(500, 0.5, 0.1) == 0.0   # decayed below 1e-5


def test_rmsprop_matches_torch():
    import torch
    w = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.3], np.float32)
    opt = make_optimizer(rmsprop=True)
    st = opt.init(jnp.asarray(w))
    upd, st = opt.update(jnp.asarray(g), st, jnp.asarray(w))
    new_w = np.asarray(jnp.asarray(w) - 0.01 * upd)

    wt = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.RMSprop([wt], lr=0.01)
    wt.grad = torch.from_numpy(g.copy())
    topt.step()
    np.testing.assert_allclose(new_w, wt.detach().numpy(), rtol=1e-6, atol=1e-7)


def test_adam_matches_torch_two_steps():
    import torch
    w = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([0.1, 0.2, -0.3], np.float32),
             np.array([-0.05, 0.4, 0.1], np.float32)]
    opt = make_optimizer(beta1=0.5)
    jw = jnp.asarray(w)
    st = opt.init(jw)
    for g in grads:
        upd, st = opt.update(jnp.asarray(g), st, jw)
        jw = jw - 1e-3 * upd

    wt = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.Adam([wt], lr=1e-3, betas=(0.5, 0.999))
    for g in grads:
        topt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(jw), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_partial_batch_epoch(images_stack):
    # 4 images, batch_size 3 -> one full batch + a partial batch of 1
    # (reference DataLoader drop_last=False keeps the remainder,
    # train.py:149-155); stats are weighted by true batch sizes.
    state = make_state()
    spec = make_spec(batch_size=3)
    run = make_epoch_runner(CFG, spec, n_epochs=2, donate=False)
    new_state, stats = run(state, images_stack, jax.random.PRNGKey(5), 1)
    stats = np.asarray(stats)
    assert stats.shape == (2, len(STAT_NAMES))
    assert np.isfinite(stats).all()
    w0 = np.asarray(state['g_params']['stem']['conv']['w'])
    w1 = np.asarray(new_state['g_params']['stem']['conv']['w'])
    assert not np.allclose(w0, w1)


def test_batch_size_larger_than_dataset(images_stack):
    # batch_size 8 > 4 images: a single partial batch per epoch
    state = make_state()
    spec = make_spec(batch_size=8)
    run = make_epoch_runner(CFG, spec, n_epochs=1, donate=False)
    _, stats = run(state, images_stack, jax.random.PRNGKey(6), 1)
    assert np.isfinite(np.asarray(stats)).all()


def test_partial_batch_stat_weighting(images_stack):
    # with n_critic=0 and shuffle off, scores are pure functions of the
    # (deterministic) augmented images; epoch score_real must equal the
    # size-weighted mean over the 3+1 split = plain mean over all 4 images
    state = make_state()
    common = dict(n_critic=0, shuffle=False, augment=False, translation=0.0,
                  gp_lambda=0.0, drift_epsilon=0.0)
    run_whole = make_epoch_runner(CFG, make_spec(batch_size=4, **common),
                                  n_epochs=1, donate=False)
    run_split = make_epoch_runner(CFG, make_spec(batch_size=3, **common),
                                  n_epochs=1, donate=False)
    _, s_whole = run_whole(state, images_stack, jax.random.PRNGKey(7), 1)
    _, s_split = run_split(state, images_stack, jax.random.PRNGKey(7), 1)
    i = STAT_NAMES.index('score_real')
    np.testing.assert_allclose(np.asarray(s_whole)[0, i],
                               np.asarray(s_split)[0, i], rtol=1e-5)


def test_epoch_runner_fast_augment(images_stack):
    """fast_augment=True compiles and trains at a sub-crop phase (the warp
    runs at phase scale; ChunkSpec wiring for config.fast_augment)."""
    state = make_state()
    spec = make_spec(phase=0, fast_augment=True)  # res 4 < crop 16
    run = make_epoch_runner(CFG, spec, n_epochs=2, donate=False)
    new_state, stats = run(state, images_stack, jax.random.PRNGKey(4), 1)
    stats = np.asarray(stats)
    assert np.isfinite(stats).all()
    w0 = np.asarray(state['g_params']['stem']['conv']['w'])
    w1 = np.asarray(new_state['g_params']['stem']['conv']['w'])
    assert not np.allclose(w0, w1)


def test_resolve_shear_auto_picks_measured_faster_backend():
    """'auto' = per-phase max(gather, shear) from the BASELINE.md per-phase
    study: gather only at the 32^2 phase, shear everywhere else; bools
    force a backend unconditionally."""
    for res in (4, 8, 16, 64, 128, 256, 512, 1024):
        assert resolve_shear('auto', res) is True
    assert resolve_shear('auto', 32) is False
    for res in (32, 512):
        assert resolve_shear(True, res) is True
        assert resolve_shear(False, res) is False
    with pytest.raises(ValueError):
        resolve_shear('fast', 64)


@pytest.mark.slow
def test_shear_auto_matches_forced_backend(images_stack):
    """A shear_warp='auto' chunk is the SAME executable as the resolved
    bool: bit-identical state/stats vs shear_warp=True away from 32^2, and
    vs shear_warp=False at a 32^2-output phase."""
    spec_auto = make_spec(fast_augment=True, shear_warp='auto')
    spec_shear = make_spec(fast_augment=True, shear_warp=True)
    s_a, st_a = make_epoch_runner(CFG, spec_auto, n_epochs=1, donate=False)(
        make_state(), images_stack, jax.random.PRNGKey(6), 1)
    s_f, st_f = make_epoch_runner(CFG, spec_shear, n_epochs=1, donate=False)(
        make_state(), images_stack, jax.random.PRNGKey(6), 1)
    np.testing.assert_array_equal(np.asarray(st_a), np.asarray(st_f))

    cfg32 = PGConfig(n_gen_features=(8,), n_dis_features=(8,),
                     latent_dim=12, image_size_init=32)
    rng = np.random.default_rng(3)
    stack32 = jnp.asarray(rng.random((4, 40, 40, 1)).astype(np.float32))
    kw = dict(crop_size=40, latent_dim=cfg32.latent_dim, fast_augment=True)
    spec_auto32 = make_spec(shear_warp='auto', **kw)
    spec_gather32 = make_spec(shear_warp=False, **kw)

    def state32():
        kg, kd = jax.random.split(jax.random.PRNGKey(0))
        return init_train_state(init_generator_pg(kg, cfg32),
                                init_discriminator_pg(kd, cfg32),
                                make_optimizer())

    s_a, st_a = make_epoch_runner(cfg32, spec_auto32, n_epochs=1,
                                  donate=False)(
        state32(), stack32, jax.random.PRNGKey(6), 1)
    s_g, st_g = make_epoch_runner(cfg32, spec_gather32, n_epochs=1,
                                  donate=False)(
        state32(), stack32, jax.random.PRNGKey(6), 1)
    np.testing.assert_array_equal(np.asarray(st_a), np.asarray(st_g))


def test_unrolled_batch_scan_matches_rolled(images_stack):
    """unroll=2 on the per-epoch batch scan is a control-flow/fusion change
    only: same ops, same order of updates.  XLA may reassociate across the
    unrolled iterations (measured ~6e-8 on CPU), so the contract is
    float-equivalence at reorder noise, not bit-identity — which is why the
    knob defaults to 1 everywhere the parity path matters."""
    spec = make_spec()
    rolled = make_epoch_runner(CFG, spec, n_epochs=2, donate=False)
    unrolled = make_epoch_runner(CFG, spec, n_epochs=2, donate=False, unroll=2)
    s_r, st_r = rolled(make_state(), images_stack, jax.random.PRNGKey(5), 1)
    s_u, st_u = unrolled(make_state(), images_stack, jax.random.PRNGKey(5), 1)
    np.testing.assert_allclose(np.asarray(st_r), np.asarray(st_u),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        s_r, s_u)


def test_gp_remat_matches_default(images_stack):
    """gp_remat replays the same GP math under jax.checkpoint — the one-
    epoch trajectory must match the non-remat step to float tolerance
    (remat changes scheduling, not values)."""
    run_base = make_epoch_runner(CFG, make_spec(), n_epochs=1, donate=False)
    run_remat = make_epoch_runner(CFG, make_spec(gp_remat=True), n_epochs=1,
                                  donate=False)
    s1, st1 = run_base(make_state(), images_stack, jax.random.PRNGKey(9), 1)
    s2, st2 = run_remat(make_state(), images_stack, jax.random.PRNGKey(9), 1)
    np.testing.assert_allclose(np.asarray(st2), np.asarray(st1),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1['d_params']),
                    jax.tree.leaves(s2['d_params'])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

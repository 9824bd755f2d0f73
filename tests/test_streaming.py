"""HBM-bounded streaming training (neuron_gan_tpu/streaming.py).

The streamed path must be *the same training run* as the resident-stack
epoch runner: identical permutation/key streams and identical per-batch
math, so state after a chunk matches to ULP-scale reassociation noise
(different executables fuse reductions differently; stats additionally
reassociate across group boundaries).  VERDICT r2 "missing" #2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuron_gan_tpu.models import (
    PGConfig, init_generator_pg, init_discriminator_pg)
from neuron_gan_tpu.streaming import (
    group_batches_for_budget, plan_groups, run_epochs_streaming)
from neuron_gan_tpu.train_step import (
    ChunkSpec, init_train_state, make_epoch_runner, make_optimizer)


CFG = PGConfig(n_gen_features=(8, 8), n_dis_features=(8, 8), latent_dim=8,
               image_size_init=4)


def _spec(n_images, batch_size, shuffle=True):
    return ChunkSpec(
        phase=1, fading=False, n_critic=1, batch_size=batch_size,
        n_images=n_images, shuffle=shuffle, crop_size=8, translation=0.05,
        augment=True, gp_lambda=10.0, drift_epsilon=1e-3, sim_lambda0=0.0,
        sim_decay=0.0, beta1=0.5, rmsprop=False, lr0=1e-3, lr_gamma=0.99,
        lr_boundary=0, lr_cap=5, alpha_start=0, alpha_step=0.25, latent_dim=8)


def _fresh_state():
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    return init_train_state(init_generator_pg(kg, CFG),
                            init_discriminator_pg(kd, CFG),
                            make_optimizer())


def test_plan_groups():
    assert plan_groups(7, 3) == [(0, 3), (3, 6), (6, 7)]
    assert plan_groups(4, 8) == [(0, 4)]
    assert plan_groups(0, 3) == []


def test_group_batches_for_budget():
    spec = _spec(n_images=32, batch_size=4)
    # bytes/batch = 4*12*12*4 = 2304; two in-flight groups per budget
    assert group_batches_for_budget(spec, 12, 4 * 2304) == 2
    assert group_batches_for_budget(spec, 12, 1) == 1          # floor at 1
    assert group_batches_for_budget(spec, 12, 10 ** 9) == 8    # cap at n_full


@pytest.mark.parametrize('max_group', [pytest.param(1, marks=pytest.mark.slow), 2, 8])
@pytest.mark.parametrize('shuffle', [True, False])
def test_streaming_matches_resident_runner(max_group, shuffle):
    n_images, B, n_epochs = 9, 2, 3   # 4 full batches + remainder of 1
    spec = _spec(n_images, B, shuffle=shuffle)
    host_images = np.random.default_rng(0).random(
        (n_images, 12, 12, 1)).astype(np.float32)
    key = jax.random.PRNGKey(42)

    runner = make_epoch_runner(CFG, spec, n_epochs, donate=False)
    ref_state, ref_stats = runner(_fresh_state(), jnp.asarray(host_images),
                                  key, 1)

    st_state, st_stats = run_epochs_streaming(
        CFG, spec, _fresh_state(), host_images, key, 1, n_epochs,
        max_group_batches=max_group)

    # the training state is the same run: identical permutation/key streams
    # and per-batch math.  The streamed path compiles different executables
    # (per-group scans vs the in-graph epoch scan), so XLA may reassociate
    # reductions differently — tolerance is ULP-scale, far below anything a
    # wrong key/order would produce (O(1)).
    for ref, got in zip(jax.tree.leaves(ref_state), jax.tree.leaves(st_state)):
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=5e-7, atol=1e-9)
    # stats may reassociate across group boundaries
    np.testing.assert_allclose(np.asarray(ref_stats), np.asarray(st_stats),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_train_cli_streams_oversize_dataset(tmp_path, monkeypatch, capsys):
    """End-to-end: a 200-image dataset over an artificially small
    hbm_budget_mb trains through train.py on the streaming path (and the
    dataset itself exceeds the preload limit, so the source is the on-disk
    memmap cache)."""
    import os
    import runpy
    import sys

    from PIL import Image
    ds_dir = tmp_path / 'ds'
    ds_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(200):
        img = rng.normal(20, 5, (16, 16)).clip(0, 255)
        img[4:12, 5:12] = rng.normal(180, 20, (8, 7)).clip(0, 255)
        img[0, 0] = 0
        Image.fromarray(img.astype(np.uint8), mode='L').save(
            ds_dir / f'im{i:03d}.png')

    out_root = tmp_path / 'run'
    out_root.mkdir()
    cfg = tmp_path / 'cfg_stream.py'
    cfg.write_text(f"""
import os
ID = 'stream1'
data_dir = r'{out_root}/data'
images_dir = r'{out_root}/images'
weights_dir = r'{out_root}/weights'
plots_dir = r'{out_root}/plots'
logs_dir = r'{out_root}/logs'
dataset_dir = r'{ds_dir}'
samples_sub_dir = os.path.join(images_dir, ID)
pggan = True
grad_pen_lambda = 10
transit_sch = [2]
alpha_step = 0.5
learning_rate = 1e-3
batch_size = 8
N_epochs = 4
beta1 = 0.5
drift_epsilon = 0.001
n_critic = 1
seed = 1
checkpointing_period = 4
translation = 0.05
latent_dim = 8
image_size = 16
N_colors = 1
N_gen_features = [8, 8]
N_dis_features = [8, 8]
resume = False
hbm_budget_mb = 0.2                # stack = 200*24*24*4 B ~ 0.44 MB > budget
dataset_preload_limit_mb = 0.2     # force the on-disk memmap cache too
""")
    monkeypatch.setattr(sys, 'argv', ['train.py', '--configs', str(cfg)])
    for mod in list(sys.modules):
        if mod.startswith('neuron_gan_tpu.configs'):
            del sys.modules[mod]
    runpy.run_path('train.py', run_name='__main__')

    out = capsys.readouterr().out
    assert 'streaming from host per epoch' in out
    weights = out_root / 'weights' / 'GenDisc_stream1.npz'
    assert weights.exists()
    from neuron_gan_tpu.checkpoint import load_pytree_npz
    payload, meta = load_pytree_npz(str(weights))
    assert meta['epoch'] == 4
    assert np.isfinite(payload['series']['Loss_real'][:4]).all()
    # the memmap cache was actually built (streaming source on disk)
    assert os.path.exists(ds_dir / '.neuron_gan_cache' / 'stack.npy')


def test_streaming_from_memmap(tmp_path):
    """The production source is a read-only memmap (NeuronDataset cache)."""
    n_images, B = 6, 2
    spec = _spec(n_images, B)
    arr = np.random.default_rng(1).random((n_images, 12, 12, 1)).astype(np.float32)
    path = tmp_path / 'stack.npy'
    np.save(path, arr)
    mm = np.load(path, mmap_mode='r')

    state, stats = run_epochs_streaming(
        CFG, spec, _fresh_state(), mm, jax.random.PRNGKey(0), 1, 2,
        max_group_batches=2)
    assert np.isfinite(np.asarray(stats)).all()

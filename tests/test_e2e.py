"""End-to-end CLI tests: train.py (fresh + resume across a growth phase),
eval.py on both checkpoint formats, and the driver entry points."""

import os
import runpy
import sys

import numpy as np
import pytest


def _write_config(path, dataset_dir, out_root, extra=''):
    path.write_text(f"""
import os
ID = 'e2e1'
data_dir = r'{out_root}/data'
images_dir = r'{out_root}/images'
weights_dir = r'{out_root}/weights'
plots_dir = r'{out_root}/plots'
logs_dir = r'{out_root}/logs'
dataset_dir = r'{dataset_dir}'
samples_sub_dir = os.path.join(images_dir, ID)
pggan = True
grad_pen_lambda = 10
transit_sch = [5, 10]
alpha_step = 0.25
learning_rate = 1e-3
batch_size = 2
N_epochs = 12
beta1 = 0.5
drift_epsilon = 0.001
n_critic = 1
seed = 1
checkpointing_period = 6
translation = 0.05
latent_dim = 8
image_size = 16
N_colors = 1
N_gen_features = [16, 8, 8]
N_dis_features = [8, 8, 16]
resume = False
{extra}
""")


def _run_cli(monkeypatch, script, argv):
    monkeypatch.setattr(sys, 'argv', [script] + argv)
    # fresh config module so each CLI run starts from defaults
    for mod in list(sys.modules):
        if mod.startswith('neuron_gan_tpu.configs'):
            del sys.modules[mod]
    try:
        runpy.run_path(script, run_name='__main__')
    except SystemExit as exc:  # the wgan path exits 0 after training
        assert exc.code in (0, None)


@pytest.mark.slow
def test_train_eval_cli_roundtrip(tmp_path, monkeypatch, tiny_dataset_dir,
                                  capsys):
    out_root = tmp_path / 'run'
    out_root.mkdir()
    cfg1 = tmp_path / 'cfg_session.py'
    _write_config(cfg1, tiny_dataset_dir, out_root, extra='N_epochs_session = 6')

    # --- session 1: epochs 1-6 (phase 0, checkpoint at 6)
    _run_cli(monkeypatch, 'train.py', ['--configs', str(cfg1)])
    weights = out_root / 'weights' / 'GenDisc_e2e1.npz'
    assert weights.exists()
    assert (out_root / 'images' / 'e2e1' / 'Samples_e2e1_6.png').exists()
    assert (out_root / 'plots' / 'Training_summary_e2e1.png').exists()
    # the SWD quality monitor is ON by default (swd_period=None follows
    # checkpointing_period): a default run produces the series + curve
    assert (out_root / 'logs' / 'SWD_e2e1.jsonl').exists()
    assert (out_root / 'plots' / 'SWD_e2e1.png').exists()

    from neuron_gan_tpu.checkpoint import load_pytree_npz
    _, meta = load_pytree_npz(str(weights))
    assert meta['epoch'] == 6
    assert meta['image_size'] == 8  # transition at 5 grew 4 -> 8
    assert meta['alpha'] == pytest.approx(0.25)  # epoch 6 = (6-5)*0.25
    # meta records the lr in effect at the checkpointed epoch (reference
    # utils.py:166 saves the current decayed lr), not the initial lr
    from neuron_gan_tpu.schedule import TrainSchedule
    sched = TrainSchedule(transit_sch=(5, 10), alpha_step=0.25, n_epochs=12,
                          checkpointing_period=6, lr0=1e-3)
    assert meta['lr'] == pytest.approx(sched.lr_at(6))

    # --- session 2: resume through growth to epoch 12 (phase 2 at 10)
    cfg2 = tmp_path / 'cfg_resume.py'
    _write_config(cfg2, tiny_dataset_dir, out_root, extra='resume = True')
    _run_cli(monkeypatch, 'train.py', ['--configs', str(cfg2)])
    _, meta = load_pytree_npz(str(weights))
    assert meta['epoch'] == 12
    assert meta['image_size'] == 16
    assert meta['alpha'] == pytest.approx(0.5)  # epoch 12 = (12-10)*0.25
    assert meta['lr'] == pytest.approx(sched.lr_at(12))

    # loss series survived the round trip and is fully populated
    payload, _ = load_pytree_npz(str(weights))
    assert len(payload['series']['Loss_real']) == 12
    assert np.isfinite(payload['series']['Loss_real']).all()

    # --- eval CLI on the native checkpoint (absolute paths: eval.py resolves
    # relative names against the default config dirs, like the reference)
    _run_cli(monkeypatch, 'eval.py',
             ['-n', '4', '-weights', str(weights),
              '-output', str(out_root / 'images' / 'eval_grid.png')])
    assert (out_root / 'images' / 'eval_grid.png').exists()

    # -swd: quality score vs the real set (one JSON line on stdout)
    _run_cli(monkeypatch, 'eval.py',
             ['-n', '4', '-weights', str(weights), '-swd',
              '-dataset_dir', str(tiny_dataset_dir),
              '-output', str(out_root / 'images' / 'eval_grid2.png')])
    out = capsys.readouterr().out
    assert '"swd_mean"' in out


@pytest.mark.slow
def test_eval_cli_reference_pth(tmp_path, monkeypatch):
    """eval.py consumes a reference-format .pth (BASELINE config 1 analog)."""
    import torch
    import jax
    from neuron_gan_tpu.models import (PGConfig, GrowthState,
                                       init_generator_pg, init_discriminator_pg)
    from neuron_gan_tpu.checkpoint import (
        export_generator_state, export_discriminator_state, make_reference_attrs)

    cfg = PGConfig(n_gen_features=(16, 8, 8), n_dis_features=(8, 8, 16),
                   latent_dim=8, image_size_init=4)
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = jax.tree.map(np.asarray, init_generator_pg(kg, cfg))
    d = jax.tree.map(np.asarray, init_discriminator_pg(kd, cfg))
    growth = GrowthState(cfg)
    growth.set_resolution(16)

    out_root = tmp_path / 'evalrun'
    (out_root / 'weights').mkdir(parents=True)
    (out_root / 'images').mkdir()

    def to_torch(state):
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state.items()}

    ckpt = {
        'epoch': 1,
        'Generator_state': to_torch(export_generator_state(g, cfg, growth)),
        'Generator_attrs': make_reference_attrs(cfg, growth, latent=True),
        'Discriminator_state': to_torch(export_discriminator_state(d, cfg, growth)),
        'Discriminator_attrs': make_reference_attrs(cfg, growth, latent=False),
        'lr': 1e-4,
    }
    torch.save(ckpt, str(out_root / 'weights' / 'gen_ref.pth'))

    # point the config at tmp dirs via env-free monkeypatching of the module
    for mod in list(sys.modules):
        if mod.startswith('neuron_gan_tpu.configs'):
            del sys.modules[mod]
    from neuron_gan_tpu.configs import config
    config.weights_dir = str(out_root / 'weights')
    config.images_dir = str(out_root / 'images')

    monkeypatch.setattr(sys, 'argv', ['eval.py', '-n', '4',
                                      '-weights', 'gen_ref.pth',
                                      '-output', 'ref_grid.png'])
    runpy.run_path('eval.py', run_name='__main__')
    out = out_root / 'images' / 'ref_grid.png'
    assert out.exists()
    from PIL import Image
    with Image.open(out) as im:
        assert im.size[0] >= 16 * 2  # 2x2 grid at 16px + padding

    # -fast (packed layout + relaxed matmul precision) renders the same grid
    monkeypatch.setattr(sys, 'argv', ['eval.py', '-n', '4', '-fast',
                                      '-weights', 'gen_ref.pth',
                                      '-output', 'ref_grid_fast.png'])
    runpy.run_path('eval.py', run_name='__main__')
    assert (out_root / 'images' / 'ref_grid_fast.png').exists()


@pytest.mark.slow
def test_adapt_critic_cli(tmp_path, monkeypatch, tiny_dataset_dir):
    """adapt_critic path: 1-epoch chunks with a dynamically bucketed n_critic."""
    out_root = tmp_path / 'ac_run'
    out_root.mkdir()
    cfg = tmp_path / 'cfg_ac.py'
    _write_config(cfg, tiny_dataset_dir, out_root,
                  extra='adapt_critic = True\nn_critic = 2\nN_epochs_session = 4\n'
                        'transit_sch = [30, 60]\nN_epochs = 100\n'
                        'checkpointing_period = 4\n')
    _run_cli(monkeypatch, 'train.py', ['--configs', str(cfg)])
    weights = out_root / 'weights' / 'GenDisc_e2e1.npz'
    assert weights.exists()
    from neuron_gan_tpu.checkpoint import load_pytree_npz
    _, meta = load_pytree_npz(str(weights))
    assert meta['epoch'] == 4


@pytest.mark.slow
def test_wgan_train_cli(tmp_path, monkeypatch, tiny_dataset_dir):
    """Legacy WGAN path: weight clamping, BN nets, per-epoch monitoring."""
    out_root = tmp_path / 'wgan_run'
    out_root.mkdir()
    cfg = tmp_path / 'cfg_wgan.py'
    cfg.write_text(f"""
import os
ID = 'wg1'
data_dir = r'{out_root}/data'
images_dir = r'{out_root}/images'
weights_dir = r'{out_root}/weights'
plots_dir = r'{out_root}/plots'
logs_dir = r'{out_root}/logs'
dataset_dir = r'{tiny_dataset_dir}'
samples_sub_dir = os.path.join(images_dir, ID)
wgan = True
pggan = False
n_critic = 2
learning_rate = 1e-4
batch_size = 2
N_epochs = 4
beta1 = 0.5
drift_epsilon = 0.001
seed = 1
checkpointing_period = 2
translation = 0.05
latent_dim = 8
image_size = 16
N_colors = 1
N_gen_features = [16, 8]
N_dis_features = [8, 16]
resume = False
""")
    _run_cli(monkeypatch, 'train.py', ['--configs', str(cfg)])
    weights = out_root / 'weights' / 'GenDisc_wg1.npz'
    assert weights.exists()
    assert (out_root / 'images' / 'Samples_wg1_4.png').exists()

    from neuron_gan_tpu.checkpoint import load_pytree_npz
    payload, meta = load_pytree_npz(str(weights))
    assert meta['epoch'] == 4 and meta['family'] == 'wgan'
    # Lipschitz clamp actually applied to every critic parameter
    import jax
    for leaf in jax.tree.leaves(payload['state']['d_params']):
        assert np.abs(np.asarray(leaf)).max() <= 0.01 + 1e-7


def test_graft_entry_single_chip():
    import jax
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 512, 512, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_graft_entry_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_train_cli_partial_batches(tmp_path, monkeypatch, tiny_dataset_dir):
    # batch_size 3 on a 4-image dataset: every epoch ends with a partial
    # batch (reference drop_last=False semantics, train.py:149-155)
    out_root = tmp_path / 'run_pb'
    out_root.mkdir()
    cfg = tmp_path / 'cfg_pb.py'
    _write_config(cfg, tiny_dataset_dir, out_root,
                  extra="ID = 'pb1'\nbatch_size = 3\n")
    _run_cli(monkeypatch, 'train.py', ['--configs', str(cfg)])
    weights = out_root / 'weights' / 'GenDisc_pb1.npz'
    assert weights.exists()
    from neuron_gan_tpu.checkpoint import load_pytree_npz
    payload, meta = load_pytree_npz(str(weights))
    assert meta['epoch'] == 12
    assert np.isfinite(payload['series']['Loss_real']).all()


@pytest.mark.slow
def test_train_cli_swd_monitor(tmp_path, monkeypatch, tiny_dataset_dir):
    """config.swd_period fires the training-time quality monitor: a JSONL
    series in logs_dir and a curve PNG in plots_dir, scored at the native
    resolution of each growth phase."""
    import json as _json
    out_root = tmp_path / 'run_swd'
    out_root.mkdir()
    cfg = tmp_path / 'cfg_swd.py'
    _write_config(cfg, tiny_dataset_dir, out_root,
                  extra=f"ID = 'swd1'\nswd_period = 4\n"
                        f"logs_dir = r'{out_root}/logs'\n")
    _run_cli(monkeypatch, 'train.py', ['--configs', str(cfg)])

    log = out_root / 'logs' / 'SWD_swd1.jsonl'
    assert log.exists()
    records = [_json.loads(l) for l in log.read_text().splitlines() if l]
    # the monitor fires at the end of every chunk that crossed a multiple
    # of swd_period=4; exact chunk boundaries depend on the growth
    # schedule, but a 12-epoch run must score at least twice and always at
    # the run's final epoch
    epochs = [r['epoch'] for r in records]
    assert len(epochs) >= 2 and epochs == sorted(epochs)
    assert epochs[-1] == 12
    assert all(np.isfinite(r['swd_mean']) for r in records)
    assert all(len(r['levels']) >= 1 for r in records)
    # scored at the NATIVE resolution of each epoch's phase (12 is
    # mid-fade at 16 after the transition at 10)
    assert records[-1]['resolution'] == 16
    assert (out_root / 'plots' / 'SWD_swd1.png').exists()


@pytest.mark.slow
def test_eval_swd_scores_midgrowth_at_native_resolution(tmp_path, monkeypatch,
                                                       tiny_dataset_dir,
                                                       capsys):
    """eval.py -swd on a mid-growth checkpoint scores at the generator's
    NATIVE resolution (re-sampled un-upsampled; reals resized to match),
    not the nearest-upsampled grid resolution."""
    import json as _json
    import jax as _jax
    from neuron_gan_tpu.models import PGConfig, init_generator_pg
    from neuron_gan_tpu.checkpoint import save_pytree_npz

    cfg = PGConfig(n_gen_features=(8, 4, 4), n_dis_features=(4, 4, 8),
                   latent_dim=6, image_size_init=4)
    g = _jax.tree.map(np.asarray,
                      init_generator_pg(_jax.random.PRNGKey(0), cfg))
    meta = {'epoch': 3, 'lr': 1e-4, 'image_size': 8, 'alpha': 0.5,
            'phase': 1, 'ID': 'mg1', 'N_gen_features': [8, 4, 4],
            'N_dis_features': [4, 4, 8], 'latent_dim': 6,
            'image_size_init': 4}
    weights = tmp_path / 'GenDisc_mg1.npz'
    save_pytree_npz(str(weights), {'state': {'g_params': g},
                                   'series': {}}, meta)

    _run_cli(monkeypatch, 'eval.py',
             ['-n', '4', '-weights', str(weights), '-swd',
              '-dataset_dir', str(tiny_dataset_dir),
              '-output', str(tmp_path / 'mg_grid.png')])
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if '"swd_mean"' in l][0]
    payload = _json.loads(line)
    assert payload['resolution'] == 8   # native, not image_size_max (16)
    assert payload['alpha'] == 0.5
    assert np.isfinite(payload['swd_mean'])


@pytest.mark.slow
def test_train_cli_trailing_save_session_clamp_float_transits(
        tmp_path, monkeypatch, tiny_dataset_dir):
    """Three driver robustness guarantees in one short run:

    * ``--transit_sch`` parses as float (reference train.py:63) but must
      not poison chunk arithmetic — TrainSchedule coerces exact ints;
    * ``N_epochs_session`` past the schedule end clamps to ``N_epochs``;
    * a final chunk that doesn't land on ``checkpointing_period`` still
      saves (the reference would discard those trailing epochs).
    """
    out_root = tmp_path / 'run'
    out_root.mkdir()
    cfg = tmp_path / 'cfg_tail.py'
    _write_config(cfg, tiny_dataset_dir, out_root,
                  extra='N_epochs = 13\nN_epochs_session = 50')
    _run_cli(monkeypatch, 'train.py',
             ['--configs', str(cfg), '--transit_sch', '5.0', '10.0'])
    from neuron_gan_tpu.checkpoint import load_pytree_npz
    weights = out_root / 'weights' / 'GenDisc_e2e1.npz'
    _, meta = load_pytree_npz(str(weights))
    assert meta['epoch'] == 13          # clamped to N_epochs, then saved
    assert meta['image_size'] == 16

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_plot_dataset_grids(tmp_path, tiny_dataset_dir):
    from neuron_gan_tpu.data import NeuronDataset
    from neuron_gan_tpu.utils.plotting import plot_dataset
    ds = NeuronDataset(tiny_dataset_dir, image_size=16)
    files = plot_dataset(ds, [4, 8, 16], directory=str(tmp_path),
                         filename_prefix='tiny')
    for f in files:
        assert os.path.exists(f)
    from PIL import Image
    with Image.open(files[0]) as im:
        assert im.size[0] > 16  # 4-wide grid of 16px tiles + padding


def test_cubic_activation():
    from neuron_gan_tpu.ops.pixelnorm import cubic_activation, init_cubic_activation
    p = init_cubic_activation()
    x = jnp.asarray([0.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(cubic_activation(x, p)),
                               [0.0, 3.0, 14.0])
    g = jax.grad(lambda pp: jnp.sum(cubic_activation(x, pp)))(p)
    np.testing.assert_allclose(np.asarray(g['a']), 9.0)  # sum x^3


def test_1024_growth_config():
    """Stretch config: 7-entry feature lists reach a 1024^2 phase
    (BASELINE.json config 5) — shapes verified at every phase cheaply."""
    from neuron_gan_tpu.models import PGConfig, init_generator_pg, generator_pg
    cfg = PGConfig(n_gen_features=(8, 8, 8, 8, 8, 8, 8),
                   n_dis_features=(8, 8, 8, 8, 8, 8, 8),
                   latent_dim=8, image_size_init=16)
    assert cfg.image_size_max == 1024
    g = init_generator_pg(jax.random.PRNGKey(0), cfg)
    z = jnp.zeros((1, 8))
    out = generator_pg(g, z, cfg, phase=6)
    assert out.shape == (1, 1024, 1024, 1)


def test_memory_logger_smoke(tmp_path):
    from neuron_gan_tpu.utils.monitor import MemoryLogger
    import time
    ml = MemoryLogger(filename='mem.png', verbose=False, log_period=0.05,
                      print_period=0.1, logs_dir=str(tmp_path))
    time.sleep(0.5)
    ml.print_log()  # force at least one plot write
    ml.stop()
    assert len(ml.mem_used) >= 2
    assert os.path.exists(os.path.join(str(tmp_path), 'mem.png'))


def test_progress_bar_overrun():
    from neuron_gan_tpu.utils.monitor import ProgressBar
    bar = ProgressBar(2, 'x')
    bar.step()
    bar.step()
    with pytest.raises(AssertionError):
        bar.step()


def test_save_vars_dump(tmp_path):
    from neuron_gan_tpu.utils.crashdump import save_vars
    import pickle
    path = save_vars({'a': 1, 'unpicklable': lambda: None},
                     verbose=False, out_dir=str(tmp_path))
    with open(path, 'rb') as f:
        saved = pickle.load(f)
    assert saved['a'] == 1
    assert saved['unpicklable'] == 'ERROR: variable cannot be saved'


def test_gdrive_download_follows_large_file_interstitial(tmp_path):
    """setup.py's downloader must follow Drive's virus-scan interstitial
    (form action + hidden inputs) instead of saving the HTML as the zip."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'setup_boot', os.path.join(os.path.dirname(__file__), os.pardir,
                                   'setup.py'))
    boot = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(boot)

    interstitial = (
        '<!DOCTYPE html><html><body>'
        '<form id="download-form" '
        'action="https://drive.usercontent.google.com/download" method="get">'
        '<input type="hidden" name="id" value="FILEID"/>'
        '<input type="hidden" name="confirm" value="t"/>'
        '<input type="hidden" name="uuid" value="abc-123"/>'
        '</form></body></html>')
    calls = []

    def fake_fetch(url, dest):
        calls.append(url)
        with open(dest, 'wb') as fh:
            fh.write(interstitial.encode() if len(calls) == 1 else b'PK-payload')

    dest = str(tmp_path / 'archive.zip')
    boot.gdrive_download('FILEID', dest, fetch=fake_fetch)
    assert len(calls) == 2
    assert calls[1].startswith('https://drive.usercontent.google.com/download?')
    assert 'confirm=t' in calls[1] and 'uuid=abc-123' in calls[1]
    assert open(dest, 'rb').read() == b'PK-payload'

    # small files come straight through: one fetch, payload kept
    calls.clear()

    def direct_fetch(url, dest):
        calls.append(url)
        with open(dest, 'wb') as fh:
            fh.write(b'PK-direct')

    boot.gdrive_download('FILEID', dest, fetch=direct_fetch)
    assert len(calls) == 1 and open(dest, 'rb').read() == b'PK-direct'


def test_make_samples_video_writes_avi(tmp_path):
    """The video exporter (reference utils.py:669-772): sorts frames by
    epoch, stamps timestamps, writes the .avi; without ffmpeg it degrades
    gracefully to .avi-only (the mp4/gif conversion is skipped)."""
    cv2 = pytest.importorskip('cv2')
    from neuron_gan_tpu.utils.video import make_samples_video
    rng = np.random.default_rng(0)
    for epoch in (100, 300, 200):  # unsorted on purpose
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f'Samples_ab_{epoch}.png'), arr)
    out = make_samples_video('timelapse.mp4', str(tmp_path),
                             video_length=1, frame_rate=3)
    assert out.endswith('.avi') or out.endswith('.mp4')
    assert (tmp_path / os.path.basename(out)).exists()
    assert (tmp_path / os.path.basename(out)).stat().st_size > 0

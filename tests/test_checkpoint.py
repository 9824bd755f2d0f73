"""Round-trip tests: native .npz checkpoints and reference .pth import.

The .pth tests build a checkpoint with the reference's exact key layout
(export_* is the inverse of the import mapping), save it with torch.save
(the real producer format), then read it back with the torch-free reader.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neuron_gan_tpu.models import (
    PGConfig, GrowthState, init_generator_pg, init_discriminator_pg,
    generator_pg, discriminator_pg,
)
from neuron_gan_tpu.checkpoint import (
    Checkpointer, save_pytree_npz, load_pytree_npz,
    export_generator_state, export_discriminator_state, make_reference_attrs,
    import_reference_checkpoint,
)
from neuron_gan_tpu.pth import load_pth


CFG = PGConfig(n_gen_features=(32, 16, 8), n_dis_features=(8, 16, 32),
               latent_dim=24, image_size_init=4, precision='highest')


def make_params():
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = jax.tree.map(np.asarray, init_generator_pg(kg, CFG))
    d = jax.tree.map(np.asarray, init_discriminator_pg(kd, CFG))
    return g, d


def test_npz_pytree_roundtrip(tmp_path):
    tree = {'a': np.arange(6).reshape(2, 3).astype(np.float32),
            'b': [np.ones(4), {'c': np.zeros((2, 2))}],
            'd': (np.float32(3.5),)}
    path = str(tmp_path / 'ckpt.npz')
    save_pytree_npz(path, tree, meta={'epoch': 7})
    got, meta = load_pytree_npz(path)
    assert meta['epoch'] == 7
    np.testing.assert_array_equal(got['a'], tree['a'])
    np.testing.assert_array_equal(got['b'][1]['c'], tree['b'][1]['c'])
    assert isinstance(got['d'], tuple)


def test_checkpointer_rolling_and_series(tmp_path):
    ck = Checkpointer(str(tmp_path / 'GenDisc_test.npz'), n_epochs=50,
                      verbose=False, extra_checkpoint_period=10)
    ck.loss_real[:20] = np.arange(20)
    tree = {'w': np.ones(3)}
    ck.save_state(20, tree, meta={'lr': 1e-4})
    assert (tmp_path / 'GenDisc_test.npz').exists()
    assert (tmp_path / 'GenDisc_test_0k.npz').exists()  # 20 % 10 == 0

    ck2 = Checkpointer(str(tmp_path / 'GenDisc_test.npz'), n_epochs=50,
                       verbose=False)
    tree2, meta = ck2.load_state()
    assert ck2.epoch == 20
    np.testing.assert_array_equal(ck2.loss_real[:20], np.arange(20))
    np.testing.assert_array_equal(tree2['w'], np.ones(3))


def _save_reference_pth(path, g, d, growth):
    """Write a checkpoint in the reference's exact format via torch.save."""
    def to_torch(state):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}

    g_attrs = make_reference_attrs(CFG, growth, latent=True)
    d_attrs = make_reference_attrs(CFG, growth, latent=False)
    g_attrs['alpha'] = torch.tensor(float(g_attrs['alpha']))
    d_attrs['alpha'] = torch.tensor(float(d_attrs['alpha']))
    ckpt = {
        'epoch': 42,
        'Generator_state': to_torch(export_generator_state(g, CFG, growth)),
        'Generator_attrs': g_attrs,
        'Discriminator_state': to_torch(export_discriminator_state(d, CFG, growth)),
        'Discriminator_attrs': d_attrs,
        'lr': 1e-4,
        'Loss_real': np.arange(42, dtype=np.float64),
        'Loss_fake': np.zeros(42),
        'Loss_G': np.zeros(42),
        'Loss_D': np.zeros(42),
    }
    torch.save(ckpt, path)


@pytest.mark.parametrize('phase,alpha', [(0, 1.0), (1, 0.5), (2, 1.0)])
def test_pth_import_roundtrip(tmp_path, phase, alpha):
    g, d = make_params()
    growth = GrowthState(CFG)
    growth.set_resolution(CFG.resolution(phase), alpha)
    path = str(tmp_path / 'GenDisc_ref.pth')
    _save_reference_pth(path, g, d, growth)

    g2, d2, cfg2, growth2, meta = import_reference_checkpoint(path)
    assert cfg2.n_gen_features == CFG.n_gen_features
    assert growth2.phase == phase
    assert growth2.fading == (alpha < 1.0)
    assert meta['epoch'] == 42
    np.testing.assert_array_equal(np.asarray(meta['Loss_real']), np.arange(42))

    # Functional equivalence: imported params produce identical outputs at the
    # checkpointed phase (unreachable to_rgb/from_rgb heads are zero-filled).
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (2, CFG.latent_dim)),
                   dtype=np.float32)
    a = None if alpha >= 1.0 else alpha
    out1 = np.asarray(generator_pg(g, jnp.asarray(z), CFG, phase, a))
    out2 = np.asarray(generator_pg(g2, jnp.asarray(z), cfg2, phase, a))
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-7)

    res = CFG.resolution(phase)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (2, res, res, 1)),
                   dtype=np.float32)
    s1 = np.asarray(discriminator_pg(d, jnp.asarray(x), CFG, phase, a))
    s2 = np.asarray(discriminator_pg(d2, jnp.asarray(x), cfg2, phase, a))
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize('phase,alpha', [(1, 0.5), (2, 1.0)])
def test_legacy_format_checkpoint_migration(tmp_path, phase, alpha):
    """Old-format checkpoints (full ToIm_list/conv_block_list plus
    ToIm_prev/last_conv_block entries) are migrated like the reference does
    (models.py:411-436/:583-608: pop-and-reindex, drop *_prev modules)."""
    g, d = make_params()
    growth = GrowthState(CFG)
    growth.set_resolution(CFG.resolution(phase), alpha)
    L = CFG.n_layers_max
    fading = alpha < 1.0
    n_completed = phase - (1 if fading else 0)
    p = 1 + n_completed          # generator ToIm pops in the new format
    m = n_completed              # grown blocks

    from neuron_gan_tpu.checkpoint import (
        _hwio_to_oihw)

    g_new = export_generator_state(g, CFG, growth)
    d_new = export_discriminator_state(d, CFG, growth)

    # --- build the OLD generator layout: full lists + *_prev modules
    g_old = {}
    for k, v in g_new.items():
        if k.startswith('ToIm_list.'):
            idx = int(k.split('.')[1])
            g_old[f'ToIm_list.{idx + p}' + k[len(f'ToIm_list.{idx}'):]] = v
        elif k.startswith('conv_block_list.'):
            idx = int(k.split('.')[1])
            g_old[f'conv_block_list.{idx + m}' + k[len(f'conv_block_list.{idx}'):]] = v
        else:
            g_old[k] = v
    for j in range(p):  # stale leading entries the migration must drop
        g_old[f'ToIm_list.{j}.layers.0.weight'] = _hwio_to_oihw(g['to_rgb'][j]['w'])
    for j in range(m):
        g_old[f'conv_block_list.{j}.1.weight'] = _hwio_to_oihw(g['blocks'][j]['conv1']['w'])
        g_old[f'conv_block_list.{j}.4.weight'] = _hwio_to_oihw(g['blocks'][j]['conv2']['w'])
    g_old['ToIm_prev.layers.0.weight'] = _hwio_to_oihw(g['to_rgb'][0]['w'])
    g_old['last_conv_block.1.weight'] = _hwio_to_oihw(g['blocks'][0]['conv1']['w'])

    # --- old discriminator layout: full lists (stale entries at the END)
    r = L - p                     # len(FromIm_list) in the new format
    d_old = dict(d_new)
    for j in range(r, L):         # stale trailing entries
        d_old[f'FromIm_list.{j}.conv.weight'] = _hwio_to_oihw(d['from_rgb'][L - 1]['w'])
        d_old[f'FromIm_list.{j}.conv.bias'] = np.asarray(d['from_rgb'][L - 1]['b'])
    n_cbl_new = L - 1 - m
    for j in range(n_cbl_new, L - 1):
        d_old[f'conv_block_list.{j}.1.weight'] = _hwio_to_oihw(d['blocks'][0]['conv1']['w'])
        d_old[f'conv_block_list.{j}.4.weight'] = _hwio_to_oihw(d['blocks'][0]['conv2']['w'])
    d_old['FromIm_prev.conv.weight'] = _hwio_to_oihw(d['from_rgb'][0]['w'])
    d_old['first_conv_block.1.weight'] = _hwio_to_oihw(d['blocks'][0]['conv1']['w'])

    def to_torch(state):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}

    g_attrs = make_reference_attrs(CFG, growth, latent=True)
    d_attrs = make_reference_attrs(CFG, growth, latent=False)
    ckpt = {
        'epoch': 1,
        'Generator_state': to_torch(g_old),
        'Generator_attrs': g_attrs,
        'Discriminator_state': to_torch(d_old),
        'Discriminator_attrs': d_attrs,
        'lr': 1e-4,
    }
    path = str(tmp_path / 'legacy.pth')
    torch.save(ckpt, path)

    g2, d2, cfg2, growth2, _ = import_reference_checkpoint(path)
    a = None if alpha >= 1.0 else alpha
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (2, CFG.latent_dim)),
                   dtype=np.float32)
    out1 = np.asarray(generator_pg(g, jnp.asarray(z), CFG, phase, a))
    out2 = np.asarray(generator_pg(g2, jnp.asarray(z), cfg2, phase, a))
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-7)
    res = CFG.resolution(phase)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(10), (2, res, res, 1)),
                   dtype=np.float32)
    s1 = np.asarray(discriminator_pg(d, jnp.asarray(x), CFG, phase, a))
    s2 = np.asarray(discriminator_pg(d2, jnp.asarray(x), cfg2, phase, a))
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-7)


def test_pth_reader_blocks_arbitrary_globals(tmp_path):
    import os
    path = str(tmp_path / 'evil.pth')
    torch.save({'cmd': os.getcwd}, path)  # a callable global
    with pytest.raises(Exception, match='blocked|whitelist|unsupported'):
        load_pth(path)


def test_pth_reader_plain_tensors(tmp_path):
    path = str(tmp_path / 'tensors.pth')
    w = torch.randn(3, 4)
    torch.save({'w': w, 'n': 5, 's': 'hello', 'scalar': torch.tensor(2.5)}, path)
    got = load_pth(path)
    np.testing.assert_allclose(got['w'], w.numpy(), rtol=0, atol=0)
    assert got['n'] == 5 and got['s'] == 'hello'
    assert float(np.asarray(got['scalar'])) == 2.5


def test_save_reference_checkpoint_roundtrip(tmp_path):
    """Our .pth writer produces files our importer (and torch) can read."""
    from neuron_gan_tpu.checkpoint import save_reference_checkpoint
    g, d = make_params()
    growth = GrowthState(CFG)
    growth.set_resolution(8, 0.5)
    path = str(tmp_path / 'exported.pth')
    save_reference_checkpoint(path, g, d, CFG, growth, epoch=7, lr=2e-4,
                              series={'Loss_real': np.arange(7.0)})
    g2, d2, cfg2, growth2, meta = import_reference_checkpoint(path)
    assert meta['epoch'] == 7 and meta['lr'] == pytest.approx(2e-4)
    assert growth2.phase == 1 and growth2.alpha == pytest.approx(0.5)
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, CFG.latent_dim)),
                   dtype=np.float32)
    out1 = np.asarray(generator_pg(g, jnp.asarray(z), CFG, 1, 0.5))
    out2 = np.asarray(generator_pg(g2, jnp.asarray(z), cfg2, 1, 0.5))
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-7)
    # and torch itself can open it
    import torch
    loaded = torch.load(path, map_location='cpu', weights_only=False)
    assert 'Generator_state' in loaded and 'layers.0.weight' in loaded['Generator_state']


def test_pth_reader_noncontiguous_tensor(tmp_path):
    path = str(tmp_path / 'strided.pth')
    w = torch.randn(6, 8).t()  # transposed view: non-default strides
    torch.save({'w': w}, path)
    got = load_pth(path)
    np.testing.assert_allclose(got['w'], w.numpy(), rtol=0, atol=0)


# --------------------------------------------------------------------------
# Tolerant restore (reference utils.py:213-218 loads strict=False, so an
# architecture tweak still resumes)
# --------------------------------------------------------------------------

def test_merge_tolerant_identical_is_bit_exact():
    from neuron_gan_tpu.checkpoint import merge_state_tolerant
    g, d = make_params()
    target = {'g_params': g, 'd_params': d}
    loaded = jax.tree.map(lambda x: np.array(x), target)
    merged, report = merge_state_tolerant(target, loaded)
    assert all(len(v) == 0 for v in report.values())
    # merged leaves ARE the loaded leaves (no copies, no target leakage)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(loaded)):
        assert a is b


def test_merge_tolerant_extra_layer():
    """Grown architecture (one more block): shared prefix restores, the new
    block keeps its fresh init and is reported missing."""
    from neuron_gan_tpu.checkpoint import merge_state_tolerant
    big = PGConfig(n_gen_features=(32, 16, 8, 8), n_dis_features=(8, 8, 16, 32),
                   latent_dim=24, image_size_init=4, precision='highest')
    kg = jax.random.PRNGKey(3)
    target = {'g_params': jax.tree.map(np.asarray, init_generator_pg(kg, big))}
    g_small, _ = make_params()
    loaded = {'g_params': g_small}
    merged, report = merge_state_tolerant(target, loaded)
    # shared blocks restored
    np.testing.assert_array_equal(merged['g_params']['blocks'][0]['conv1']['w'],
                                  g_small['blocks'][0]['conv1']['w'])
    np.testing.assert_array_equal(merged['g_params']['stem']['conv']['w'],
                                  g_small['stem']['conv']['w'])
    # the extra block kept its init and is reported
    np.testing.assert_array_equal(merged['g_params']['blocks'][2]['conv1']['w'],
                                  target['g_params']['blocks'][2]['conv1']['w'])
    assert any('blocks[2]' in p for p in report['missing'])
    assert any('to_rgb[3]' in p for p in report['missing'])


def test_merge_tolerant_shape_mismatch_kept_and_reported():
    from neuron_gan_tpu.checkpoint import merge_state_tolerant
    target = {'w': np.zeros((3, 3, 8, 16), np.float32),
              'b': np.zeros(4, np.float32)}
    loaded = {'w': np.ones((3, 3, 4, 16), np.float32),
              'b': np.ones(4, np.float32)}
    merged, report = merge_state_tolerant(target, loaded)
    np.testing.assert_array_equal(merged['w'], target['w'])  # kept
    np.testing.assert_array_equal(merged['b'], loaded['b'])  # restored
    assert len(report['mismatched']) == 1 and 'w' in report['mismatched'][0][0]


def test_merge_tolerant_namedtuple_optimizer_state():
    from neuron_gan_tpu.checkpoint import merge_state_tolerant
    import optax
    g, _ = make_params()
    opt = optax.scale_by_adam(b1=0.5)
    target = {'g_opt': opt.init(jax.tree.map(jnp.asarray, g))}
    loaded = jax.tree.map(lambda x: np.asarray(x) + 1, target)
    merged, report = merge_state_tolerant(target, loaded)
    assert all(len(v) == 0 for v in report.values())
    assert type(merged['g_opt']).__name__ == type(target['g_opt']).__name__
    np.testing.assert_array_equal(
        np.asarray(merged['g_opt'].count), np.asarray(loaded['g_opt'].count))


def test_merge_tolerant_unexpected_keys_reported():
    from neuron_gan_tpu.checkpoint import merge_state_tolerant
    target = {'a': np.zeros(2)}
    loaded = {'a': np.ones(2), 'stale': np.ones(3)}
    merged, report = merge_state_tolerant(target, loaded)
    assert 'stale' not in merged
    assert any('stale' in p for p in report['unexpected'])


# --------------------------------------------------------------------------
# Torch-free .pth writer (pth.save_pth)
# --------------------------------------------------------------------------

def test_save_pth_roundtrip_both_readers(tmp_path):
    """save_pth output loads identically via load_pth and real torch.load."""
    from collections import OrderedDict
    from neuron_gan_tpu.pth import save_pth, TensorValue
    path = str(tmp_path / 'written.pth')
    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 4)).astype(np.float32)
    obj = {
        'epoch': 7, 'lr': 2e-4, 'name': 'abc',
        'state': OrderedDict([
            ('w', TensorValue(w)),
            ('alpha', TensorValue(np.float32(0.25))),
            ('idx', TensorValue(np.arange(5, dtype=np.int64))),
        ]),
        'series': np.arange(3.0),
        'nested': {'flag': True, 'lst': [1, 2.5]},
    }
    save_pth(path, obj)

    got = load_pth(path)
    np.testing.assert_array_equal(got['state']['w'], w)
    assert np.asarray(got['state']['alpha']).reshape(()) == 0.25
    assert got['state']['idx'].dtype == np.int64
    np.testing.assert_array_equal(got['series'], np.arange(3.0))
    assert got['nested'] == {'flag': True, 'lst': [1, 2.5]}

    t = torch.load(path, map_location='cpu', weights_only=False)
    assert isinstance(t['state']['w'], torch.Tensor)
    np.testing.assert_array_equal(t['state']['w'].numpy(), w)
    assert t['state']['idx'].dtype == torch.int64
    assert t['epoch'] == 7 and isinstance(t['state'], type(obj['state']))


def test_save_pth_noncontiguous_input(tmp_path):
    """TensorValue contiguity-normalizes strided views before writing."""
    from neuron_gan_tpu.pth import save_pth, TensorValue
    path = str(tmp_path / 'strided_w.pth')
    base = np.arange(48, dtype=np.float32).reshape(6, 8)
    view = base.T  # non-contiguous
    save_pth(path, {'w': TensorValue(view)})
    got = load_pth(path)
    np.testing.assert_array_equal(got['w'], view)
    t = torch.load(path, map_location='cpu', weights_only=False)
    np.testing.assert_array_equal(t['w'].numpy(), view)


def test_save_pth_repeated_tensor_values(tmp_path):
    """The same TensorValue appearing twice memoizes (single storage)."""
    import zipfile
    from neuron_gan_tpu.pth import save_pth, TensorValue
    path = str(tmp_path / 'memo.pth')
    tv = TensorValue(np.ones((3, 3), np.float32))
    save_pth(path, {'a': tv, 'b': tv})
    with zipfile.ZipFile(path) as zf:
        storages = [n for n in zf.namelist() if '/data/' in n]
    assert len(storages) == 1
    t = torch.load(path, map_location='cpu', weights_only=False)
    np.testing.assert_array_equal(t['a'].numpy(), t['b'].numpy())


def test_convert_checkpoint_cli_roundtrip(tmp_path):
    """tools/convert_checkpoint.py: npz -> pth -> npz preserves weights
    bit-exactly and carries growth meta + loss series both ways."""
    import os
    import runpy
    import sys as _sys

    from neuron_gan_tpu.models import (PGConfig, GrowthState,
                                       init_generator_pg, init_discriminator_pg)
    from neuron_gan_tpu.checkpoint import save_pytree_npz, load_pytree_npz
    from neuron_gan_tpu.pth import load_pth

    cfg = PGConfig(n_gen_features=(8, 4, 4), n_dis_features=(4, 4, 8),
                   latent_dim=6, image_size_init=4)
    kg, kd = jax.random.split(jax.random.PRNGKey(3))
    g = jax.tree.map(np.asarray, init_generator_pg(kg, cfg))
    d = jax.tree.map(np.asarray, init_discriminator_pg(kd, cfg))
    growth = GrowthState(cfg)
    growth.set_resolution(8, 0.5)
    meta = {'epoch': 7, 'lr': 2e-4, 'image_size': 8, 'alpha': 0.5,
            'phase': 1, 'ID': 'cv1',
            'N_gen_features': [8, 4, 4], 'N_dis_features': [4, 4, 8],
            'latent_dim': 6, 'image_size_init': 4}
    series = {'Loss_real': np.arange(7.0), 'Loss_fake': np.ones(7),
              'Loss_G': np.zeros(7), 'Loss_D': np.zeros(7)}
    npz1 = str(tmp_path / 'GenDisc_cv1.npz')
    save_pytree_npz(npz1, {'state': {'g_params': g, 'd_params': d},
                           'series': series}, meta)

    tool = os.path.join(os.path.dirname(__file__), os.pardir, 'tools',
                        'convert_checkpoint.py')
    pth = str(tmp_path / 'cv1.pth')
    _sys.argv = [tool, npz1, pth]
    runpy.run_path(tool, run_name='__main__')
    saved = load_pth(pth)
    assert saved['epoch'] == 7
    assert float(np.asarray(saved['Generator_attrs']['alpha'])) == 0.5
    np.testing.assert_array_equal(saved['Loss_real'], np.arange(7.0))

    npz2 = str(tmp_path / 'GenDisc_cv2.npz')
    _sys.argv = [tool, pth, npz2]
    runpy.run_path(tool, run_name='__main__')
    payload, meta2 = load_pytree_npz(npz2)
    assert meta2['image_size'] == 8 and meta2['alpha'] == 0.5
    assert meta2['epoch'] == 7
    for a, b in zip(jax.tree.leaves(g),
                    jax.tree.leaves(payload['state']['g_params'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(d),
                    jax.tree.leaves(payload['state']['d_params'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(payload['series']['Loss_fake'], np.ones(7))


def test_pth_rejects_out_of_bounds_tensor_geometry():
    # a corrupted/crafted .pth must not read past its storage buffer
    import numpy as np
    import pytest
    from neuron_gan_tpu.pth import _rebuild_tensor_v2
    storage = {'array': np.zeros(4, np.float32)}
    with pytest.raises(ValueError, match='exceeds storage'):
        _rebuild_tensor_v2(storage, 0, (10 ** 6,), (1,), False, None)
    with pytest.raises(ValueError, match='invalid tensor geometry'):
        _rebuild_tensor_v2(storage, 0, (2,), (-1,), False, None)
    # in-bounds strided view still works, including offset
    out = _rebuild_tensor_v2(storage, 1, (3,), (1,), False, None)
    assert out.shape == (3,)
    # zero-size dims are empty tensors, not reads
    assert _rebuild_tensor_v2(storage, 0, (0, 5), (1, 1), False, None).size == 0


def test_convert_checkpoint_bare_state_and_custom_knobs(tmp_path):
    """npz_to_pth accepts a bare state tree (the stretch tool's layout,
    which train.py also resumes) and propagates N_colors/LeakyReLU_leak
    into the reference attrs instead of silently writing defaults."""
    import importlib.util
    import os
    import jax
    from neuron_gan_tpu.models import (
        PGConfig, init_generator_pg, init_discriminator_pg)
    from neuron_gan_tpu.checkpoint import save_pytree_npz
    from neuron_gan_tpu.pth import load_pth

    cfg = PGConfig(n_gen_features=(8, 8), n_dis_features=(8, 8),
                   latent_dim=8, image_size_init=4, n_colors=3,
                   neg_slope=0.3)
    state = {'g_params': init_generator_pg(jax.random.PRNGKey(0), cfg),
             'd_params': init_discriminator_pg(jax.random.PRNGKey(1), cfg)}
    meta = {'epoch': 1, 'lr': 1e-4, 'image_size': 8, 'alpha': 1.0,
            'phase': 1, 'ID': 't', 'N_gen_features': [8, 8],
            'N_dis_features': [8, 8], 'latent_dim': 8,
            'image_size_init': 4, 'N_colors': 3, 'LeakyReLU_leak': 0.3}
    src = str(tmp_path / 'bare.npz')
    dst = str(tmp_path / 'bare.pth')
    save_pytree_npz(src, state, meta)  # bare tree: no {'state': ...} wrapper

    tool = os.path.join(os.path.dirname(__file__), os.pardir, 'tools',
                        'convert_checkpoint.py')
    spec = importlib.util.spec_from_file_location('cc_tool', tool)
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)
    cc.npz_to_pth(src, dst)

    sd = load_pth(dst)
    assert sd['Generator_attrs']['N_colors'] == 3
    assert sd['Generator_attrs']['LeakyReLU_neg_slope'] == 0.3

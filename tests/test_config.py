import os
import sys

import pytest


@pytest.fixture
def config():
    # Fresh config module per test (it is global/mutable by design).
    for mod in list(sys.modules):
        if mod.startswith('neuron_gan_tpu.configs'):
            del sys.modules[mod]
    from neuron_gan_tpu.configs import config as cfg
    return cfg


def test_defaults_match_reference(config):
    # reference: configs/config.py:18-63
    assert config.n_critic == 1
    assert config.grad_pen_lambda == 10
    assert config.transit_sch == [25000, 50000, 75000, 100000, 125000]
    assert config.alpha_step == 0.0001
    assert config.learning_rate == 0.0001
    assert config.batch_size == 8
    assert config.beta1 == 0.5
    assert config.drift_epsilon == 0.001
    assert config.latent_dim == 512
    assert config.image_size == 512
    assert config.N_colors == 1
    assert config.LeakyReLU_leak == 0.2
    assert config.N_gen_features == [128, 64, 32, 32, 16, 16]
    assert config.N_dis_features == [16, 16, 32, 32, 64, 128]


def test_id_dependent_configs(config):
    config.ID = '0009'
    config.define_ID_dependent_configs()
    assert config.N_gen_features == [32, 32, 32, 32, 16, 16]
    assert config.N_dis_features == [16, 16, 32, 32, 32, 32]
    config.ID = '0011'
    config.define_ID_dependent_configs()
    assert config.N_gen_features == [128, 64, 32, 32, 16, 16]


def test_import_configs_whitelist_rejects_unknown(config, tmp_path):
    bad = tmp_path / 'bad_config.py'
    bad.write_text('not_a_real_knob = 42\n')
    with pytest.raises(ValueError, match='not_a_real_knob'):
        config.import_configs(str(bad), interactive=False)


def test_import_configs_cli_precedence(config, tmp_path):
    user = tmp_path / 'user_config.py'
    user.write_text('ID = "zzzz"\nlatent_dim = 64\nbatch_size = 4\n'
                    'transit_sch = [30, 60, 90, 120, 150]\nalpha_step = 0.1\n'
                    'N_epochs = 200\n')
    config.import_configs(str(user), overwritten_configs={'batch_size': 2},
                          interactive=False)
    assert config.latent_dim == 64        # from user config
    assert config.batch_size == 2         # CLI wins
    assert config.ID == 'zzzz'
    assert config.samples_sub_dir.endswith('zzzz')


def test_validate_rejects_bad_image_size(config):
    config.ID = 'test'
    config.image_size = 100
    with pytest.raises(AssertionError, match='power of 2'):
        config.validate_configs(interactive=False)


def test_validate_rejects_mismatched_layer_counts(config):
    config.ID = 'test'
    config.N_gen_features = [16, 16, 16]
    config.N_dis_features = [16, 16]
    with pytest.raises(AssertionError, match='must match'):
        config.validate_configs(interactive=False)


def test_transit_period_overrides_schedule(config):
    config.ID = 'test'
    config.N_gen_features = [32, 16, 16]
    config.N_dis_features = [16, 16, 32]
    config.image_size = 16
    config.transit_period = 100
    config.alpha_step = 0.05
    config.N_epochs = 500
    config.validate_configs(interactive=False)
    assert config.transit_sch == [100, 200]


def test_validate_rejects_overlapping_transitions(config):
    config.ID = 'test'
    config.transit_sch = [100, 150, 200, 250, 300]
    config.alpha_step = 0.0001  # fade needs 10k epochs > 50-epoch spacing
    with pytest.raises(AssertionError, match='separated'):
        config.validate_configs(interactive=False)


def test_config_fast_preset_imports_and_validates(config):
    """The speed preset passes the same import/whitelist/validation path as
    any user config and sets exactly the two opt-in trade knobs."""
    config.import_configs('config_fast.py', overwritten_configs={'ID': 'cf1'})
    assert config.compute_dtype == 'mixed'
    assert config.gp_reuse_fakes is True
    # everything else matches the reference example values
    assert config.batch_size == 8 and config.image_size == 512
    assert config.N_gen_features == [128, 64, 32, 32, 16, 16]

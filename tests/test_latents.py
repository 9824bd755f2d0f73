import numpy as np
import jax
import jax.numpy as jnp

from neuron_gan_tpu.utils import sample_latent_vec, sample_latent_vec_seeded


def test_randn_latents_on_unit_hypersphere():
    z = sample_latent_vec(jax.random.PRNGKey(0), (32, 64))
    norms = np.linalg.norm(np.asarray(z), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_rand_mode_range():
    z = np.asarray(sample_latent_vec(jax.random.PRNGKey(1), (128, 16), mode='rand'))
    assert z.min() >= -1.0 and z.max() <= 1.0


def test_seeded_memo_returns_identical_latents():
    a = sample_latent_vec_seeded((16, 64), seed=0)
    b = sample_latent_vec_seeded((16, 64), seed=0)
    assert a is b
    c = sample_latent_vec_seeded((16, 64), seed=1)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_latents_deterministic_per_key():
    z1 = sample_latent_vec(jax.random.PRNGKey(7), (4, 8))
    z2 = sample_latent_vec(jax.random.PRNGKey(7), (4, 8))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))

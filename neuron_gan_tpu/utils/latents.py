"""Latent-vector sampling.

Reference semantics (utils.py:57-92): draw standard normals, clamp to
[-5, 5], then L2-normalize each row -> points uniform on the unit hypersphere
("Choosing a Point from the Surface of a Sphere", 1972).  The reference also
memoizes seeded draws so that eval grids across checkpoints reuse identical
latents (utils.py:54, :60-67, :82-87); ``sample_latent_vec_seeded`` keeps that
behavior with JAX PRNG keys (deterministic by construction, memo kept to avoid
re-tracing on the host path).
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('size', 'mode', 'dtype'))
def sample_latent_vec(key, size, mode='randn', dtype=jnp.float32):
    """Sample a batch of latent vectors. ``size`` = (batch, latent_dim)."""
    if mode == 'rand':
        z = 2.0 * jax.random.uniform(key, size, dtype=dtype) - 1.0
    elif mode == 'randn':
        z = jnp.clip(jax.random.normal(key, size, dtype=dtype), -5.0, 5.0)
        z = z / jnp.linalg.norm(z, ord=2, axis=1, keepdims=True)
    else:
        raise ValueError('{} is not supported'.format(mode))
    return z


_latent_vecs_memo = {}


def sample_latent_vec_seeded(size, seed, mode='randn', dtype=jnp.float32):
    """Seeded variant: identical latents for identical (size, mode, seed)."""
    memo_key = (tuple(size), mode, int(seed), jnp.dtype(dtype).name)
    if memo_key not in _latent_vecs_memo:
        key = jax.random.PRNGKey(int(seed))
        _latent_vecs_memo[memo_key] = sample_latent_vec(key, tuple(size), mode=mode, dtype=dtype)
    return _latent_vecs_memo[memo_key]

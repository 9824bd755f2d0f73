"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths compile and run without TPU hardware (SURVEY.md §4 implication)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # force: the host env may pin a TPU platform
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

# The axon sitecustomize (TPU tunnel) calls jax.config.update('jax_platforms',
# 'axon,cpu') at interpreter boot, overriding the env var — override it back
# so tests run on the 8-device virtual CPU mesh.
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir)))

import numpy as np
import pytest


@pytest.fixture(scope='session')
def tiny_dataset_dir(tmp_path_factory):
    """4 synthetic 16x16 uint8 'neuron' images: dark noisy bg, bright blob."""
    from PIL import Image
    d = tmp_path_factory.mktemp('science_tiny16')
    rng = np.random.default_rng(42)
    for i in range(4):
        img = rng.normal(20, 5, (16, 16)).clip(0, 255)
        img[4 + i:12 + i, 5:12] = rng.normal(180, 20, (8, 7)).clip(0, 255)
        img[0:2, 0:2] = 0
        Image.fromarray(img.astype(np.uint8), mode='L').save(d / f'im{i}.png')
    return str(d)


_modules_since_cache_clear = [0]


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_between_modules():
    """Free executables/trace caches every few test modules.

    One pytest process compiles ~200 XLA:CPU programs across the suite;
    on some hosts the accumulated JIT state eventually segfaults the
    XLA:CPU compiler itself (observed: deterministic SIGSEGV inside
    backend_compile_and_load at the ~200th compile, position-dependent —
    moving tests moved the crash).  Modules don't share jitted model
    functions, so periodic clearing only recompiles the small shared
    jnp primitives; every 3rd module keeps per-process compiler state
    far below the observed crash threshold without paying the full
    per-module recompile tax.
    """
    yield
    _modules_since_cache_clear[0] += 1
    if _modules_since_cache_clear[0] >= 3:
        _modules_since_cache_clear[0] = 0
        import jax
        jax.clear_caches()

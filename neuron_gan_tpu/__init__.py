"""neuron_gan_tpu: a TPU-native (JAX/XLA/Pallas/pjit) re-implementation of the
capabilities of the ``oliviertrottier/neuron-gan`` reference framework.

The reference is a PyTorch progressively-growing GAN (PGGAN) trained with a
WGAN-GP + drift loss on a tiny single-channel neuron image dataset
(reference: README.md:1-91).  This package rebuilds every capability
TPU-first:

* static-shape, phase-indexed pure-function models (no mutable module
  topology; see models/pggan.py vs reference models.py:355-392),
* one jitted train step per (resolution phase, fading?) pair with the WGAN-GP
  double-backward expressed as jax.grad-of-grad (losses.py vs reference
  loss_functions.py:148-180),
* a fully on-device data pipeline: the whole dataset lives in HBM and
  augmentation is a jitted function of a PRNG key (data/ vs reference
  data/NeuronDataset.py),
* data/model-parallel scaling over a jax.sharding.Mesh (parallel/),
* checkpointing in a native format plus a torch-free ``.pth`` importer
  (checkpoint.py, pth.py vs reference utils.py:142-223).
"""

__version__ = "0.1.0"


def enable_compilation_cache(path=None):
    """Enable JAX's persistent compilation cache.

    Worth it on this stack: TPU executables compile remotely (minutes for the
    512x512 train step); the cache makes every subsequent process start warm.
    Called by the CLIs (train.py/eval.py/bench.py); safe to call repeatedly.
    """
    import os
    import jax
    if jax.default_backend() == 'cpu':
        # Do NOT cache for the CPU backend: XLA:CPU cache entries are AOT
        # results that embed the compiling host's CPU features, and a
        # cache written on a different host (VM migration) SIGILLs or
        # segfaults on load — observed in practice via the cpu_aot_loader
        # machine-feature warnings followed by exit 139.  CPU compiles are
        # seconds; the cache's value is the minutes-long remote TPU
        # compiles, which stay cached below.
        return None
    if path is None:
        path = os.environ.get(
            'NEURON_GAN_TPU_CACHE',
            os.path.join(os.path.expanduser('~'), '.cache', 'neuron_gan_tpu_xla'))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass  # older jax without the knobs
    return path

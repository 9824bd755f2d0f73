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

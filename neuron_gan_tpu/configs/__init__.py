from neuron_gan_tpu.configs import config  # noqa: F401

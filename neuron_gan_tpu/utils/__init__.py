from neuron_gan_tpu.utils.latents import sample_latent_vec, sample_latent_vec_seeded  # noqa: F401
from neuron_gan_tpu.utils.io import validated_input  # noqa: F401

from neuron_gan_tpu.models.pggan import (  # noqa: F401
    PGConfig,
    init_generator_pg,
    init_discriminator_pg,
    generator_pg,
    discriminator_pg,
    GrowthState,
)

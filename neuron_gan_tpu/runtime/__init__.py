from neuron_gan_tpu.runtime.native import (  # noqa: F401
    native_available, multi_otsu_hist, noise_stats_u8,
)

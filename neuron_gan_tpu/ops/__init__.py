from neuron_gan_tpu.ops.equalized import (  # noqa: F401
    calculate_gain,
    equalized_conv2d,
    equalized_linear,
    init_conv2d,
    init_linear,
    conv2d,
)
from neuron_gan_tpu.ops.pixelnorm import pixel_norm, leaky_relu, lrelu_pixel_norm  # noqa: F401
from neuron_gan_tpu.ops.resize import (  # noqa: F401
    upsample2_bilinear,
    downsample2_bilinear,
    avg_pool,
    resize_antialias,
    resize_nearest,
)
from neuron_gan_tpu.ops.fadein import fade_in  # noqa: F401

from neuron_gan_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_params, replicate, batch_spec, param_partition_spec,
)

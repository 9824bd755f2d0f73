"""Device-mesh scaling (data + model parallel) via jax.sharding + pjit.

The reference is strictly single-device (SURVEY.md §2.3: no DDP/NCCL/MPI —
train.py:127-134 binds one device).  The TPU-native scaling design follows
the standard JAX recipe: declare a Mesh, annotate array shardings, and let
XLA insert the collectives (gradient psums ride ICI):

* **data axis**: the train batch is sharded over 'data'
  (train_step.py annotates the augmented batch with a sharding constraint);
  parameters are replicated along it, so XLA all-reduces gradients.
* **model axis** (optional): conv output-channel dimensions (the last axis of
  HWIO weights) are sharded over 'model' where divisible — tensor parallelism
  for the wide low-resolution layers; XLA propagates the activation sharding
  and inserts all-gathers where the channel-sharded tensor meets a
  spatially-replicated op.

At the reference's model sizes a single chip is ample; this module exists so
the same train step scales to a v5e slice unchanged (BASELINE.json stretch
config) and is exercised on a virtual CPU mesh in tests and in
__graft_entry__.dryrun_multichip.
"""

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[dict] = None) -> Optional[Mesh]:
    """mesh_shape e.g. {'data': 8} or {'data': 4, 'model': 2}; None = no mesh.

    Device assignment goes through mesh_utils.create_device_mesh so that on
    real TPU slices the minor mesh axis lands on physically adjacent chips
    (the per-layer model-axis collectives ride nearest-neighbor ICI); a
    plain jax.devices() reshape ignores the interconnect topology.  Falls
    back to the naive reshape where mesh_utils rejects the configuration
    (e.g. virtual CPU devices with a partial device count).
    """
    if not mesh_shape:
        return None
    axis_names = tuple(mesh_shape.keys())
    sizes = tuple(int(v) for v in mesh_shape.values())
    n = int(np.prod(sizes))
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f'mesh {mesh_shape} needs {n} devices, '
                         f'have {len(devices)}')
    try:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_device_mesh(sizes, devices[:n])
    except Exception:
        dev_array = np.array(devices[:n]).reshape(sizes)
    return Mesh(dev_array, axis_names)


def batch_spec(mesh: Optional[Mesh], ndim: int = 4) -> Optional[P]:
    if mesh is None or 'data' not in mesh.axis_names:
        return None
    return P('data', *([None] * (ndim - 1)))


def param_partition_spec(path_leaf_shape, mesh: Mesh, min_shard_channels=2):
    """PartitionSpec for one parameter: shard the output-channel (last) axis
    of conv/linear weights over 'model' when evenly divisible."""
    if 'model' not in mesh.axis_names:
        return P()
    model_size = mesh.shape['model']
    shape = path_leaf_shape
    if len(shape) >= 2 and shape[-1] % model_size == 0 \
            and shape[-1] // model_size >= min_shard_channels:
        return P(*([None] * (len(shape) - 1) + ['model']))
    return P()


def shard_params(params, mesh: Optional[Mesh]):
    """device_put every leaf with its partition spec (replicated on 'data')."""
    if mesh is None:
        return params

    def place(leaf):
        spec = param_partition_spec(np.shape(leaf), mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def replicate(tree, mesh: Optional[Mesh]):
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)

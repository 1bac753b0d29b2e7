"""Device mesh / sharding utilities — data parallelism over ICI.

The reference is single-GPU (``--device cuda``, no torch.distributed
anywhere — SURVEY.md §2.4).  Here data parallelism is first-class: a 1-D
``Mesh`` over all local devices, batches sharded on the leading axis, params
replicated.  Gradients all-reduce over ICI automatically: the train steps are
pure functions, so ``jit`` with these shardings lets GSPMD insert the
``psum``s.  Multi-host pods extend this via ``jax.distributed.initialize``
(each process feeds its local shard); the mesh abstraction leaves room for
extra axes (tp/pp) which these CNN-scale models intentionally don't need.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))

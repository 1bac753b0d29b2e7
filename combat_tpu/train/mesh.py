"""Device mesh / sharding utilities — data parallelism over ICI.

The reference is single-GPU (``--device cuda``, no torch.distributed
anywhere — SURVEY.md §2.4).  Here data parallelism is first-class: a 1-D
``Mesh`` over all local devices, batches sharded on the leading axis, params
replicated.  Gradients all-reduce over ICI automatically: the train steps are
pure functions, so ``jit`` with these shardings lets GSPMD insert the
``psum``s.  Multi-host pods extend this via ``jax.distributed.initialize``
(each process feeds its local shard).

These CNN-scale models don't *need* tensor parallelism, but the mesh
abstraction supports it: ``make_mesh_2d`` builds a (data, model) mesh and
``channel_sharding`` produces Megatron-style channel-sharded param specs
(last/output-channel axis split over the model axis; GSPMD inserts the
activation all-gathers).  ``__graft_entry__.dryrun_multichip`` exercises a
full alternated train step under this 2-D layout.
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


def make_mesh_2d(n_data: int, n_model: int, axes=("data", "model")) -> Mesh:
    """2-D (data, model) mesh: batch sharded over ``data``, channel-sharded
    params over ``model`` (see ``channel_sharding``)."""
    devices = np.asarray(jax.devices()[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh's first axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def channel_sharding(mesh: Mesh, tree, axis: str = "model"):
    """Megatron-style tensor-parallel sharding spec tree for ``tree``.

    Every array leaf whose trailing (output-channel, in Flax layout:
    conv kernels (kh, kw, cin, cout), dense (in, out), bias/BN (out,))
    dimension divides the ``axis`` size is split over that axis; everything
    else (scalars, odd shapes) is replicated.  Works on any pytree whose
    leaves mirror param shapes — optimizer momentum buffers included — so it
    can be applied to a whole ``TrainState`` in one ``jax.device_put``.
    GSPMD then keeps weights resident in shards and inserts the activation
    collectives over ICI.
    """
    size = mesh.shape[axis]

    def rule(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[-1] >= size and x.shape[-1] % size == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))

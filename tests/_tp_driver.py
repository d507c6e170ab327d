"""Subprocess driver for the tensor-parallel mesh test.

Run by tests/test_multihost.py in a FRESH process: the 8-virtual-device
DP psums plus the per-layer TP all-reduces make this the heaviest
collective workload in the suite, and XLA:CPU's collective rendezvous
has a 40 s hard timeout that SIGABRTs the whole process when the
1-core host is loaded (observed killing full-suite runs). Isolation
keeps the suite alive and gives the rendezvous the idle host.

Asserts: one hoisted train step on the 2-D (data, model) mesh with
Megatron-style TP_RULES shardings produces the same stats as the
pure-DP run.
"""

import numpy as np

from __graft_entry__ import _provision_virtual_devices

_provision_virtual_devices(8)


def main() -> None:
    import jax

    from layoutdetr_tpu.models.discriminator import Discriminator
    from layoutdetr_tpu.models.generator import (
        Generator,
        GeneratorConfig,
        make_text_feature_fn,
    )
    from layoutdetr_tpu.parallel.mesh import (
        collective_compiler_options,
        make_mesh,
        replicate,
        shard_batch,
        shard_params,
    )
    from layoutdetr_tpu.training.optimizers import (
        D_FROZEN_SUBSTRINGS,
        G_FROZEN_SUBSTRINGS,
        build_optimizer,
    )
    from layoutdetr_tpu.training.train_step import GANTrainState, make_train_step

    assert len(jax.devices()) >= 8
    cfg = GeneratorConfig(
        hidden_dim=16, bert_f_dim=32, bert_num_heads=2, bert_num_encoder_layers=1,
        bert_num_decoder_layers=1, bert_intermediate_size=64,
        bert_max_position_embeddings=32, im_f_dim=16, max_text_length=16,
        vocab_size=64, bos_token_id=62, nhead=2, num_encoder_layers=1,
        num_decoder_layers=1, dim_feedforward=32, background_size=32,
        max_elements=3,
    )
    rng = np.random.default_rng(0)
    b, n, t = 8, 3, 8
    kw = dict(
        z=rng.normal(size=(b, n, cfg.z_dim)).astype(np.float32),
        bbox_class=rng.integers(0, 8, (b, n)),
        bbox_real=rng.uniform(0.1, 0.9, (b, n, 4)).astype(np.float32),
        text_ids=rng.integers(1, 60, (b, n, t)),
        text_mask=np.ones((b, n, t), np.int32),
        text_len=rng.integers(0, 16, (b, n)),
        padding_mask=np.zeros((b, n), bool),
        background=rng.normal(size=(b, 32, 32, 3)).astype(np.float32),
    )
    g, d = Generator(cfg), Discriminator(cfg)
    key = jax.random.PRNGKey(0)
    params_g = g.init({"params": key, "dropout": key, "noise": key},
                      reconst=True, **kw)
    params_d = d.init({"params": key, "dropout": key, "noise": key},
                      bbox=kw["bbox_real"], reconst=True,
                      **{k: v for k, v in kw.items() if k not in ("z", "bbox_real")})
    tx_g = build_optimizer(params_g, reg_interval=4, frozen_substrings=G_FROZEN_SUBSTRINGS)
    tx_d = build_optimizer(params_d, reg_interval=16, frozen_substrings=D_FROZEN_SUBSTRINGS)

    batch = dict(bboxes=kw["bbox_real"], labels=kw["bbox_class"],
                 text_ids=kw["text_ids"], text_mask=kw["text_mask"],
                 text_len=kw["text_len"], mask=~kw["padding_mask"],
                 background=kw["background"])
    step_fn = make_train_step(
        g.apply, d.apply, tx_g, tx_d, batch_size=b, z_dim=cfg.z_dim,
        max_elements=cfg.max_elements, deterministic=True,
        text_feature_fn=make_text_feature_fn(cfg, flash=False))

    def run(mesh, place_params):
        state = GANTrainState.create(params_g, params_d, tx_g, tx_d)
        state = place_params(state, mesh)
        sb = shard_batch(batch, mesh)
        st, stats = jax.jit(
            step_fn, compiler_options=collective_compiler_options(mesh),
        )(state, sb, jax.random.PRNGKey(1))
        del st
        return jax.device_get(stats)

    stats_dp = run(make_mesh(8), replicate)
    stats_tp = run(make_mesh(8, model_parallel=2), shard_params)
    for k in stats_dp:
        np.testing.assert_allclose(float(stats_tp[k]), float(stats_dp[k]),
                                   rtol=5e-4, atol=5e-5)
    print("TP_MESH OK")


if __name__ == "__main__":
    main()

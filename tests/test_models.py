"""Shape-contract tests for the model stack (tiny configs).

The reference's de-facto integration test is a full G/D forward at
startup (misc.print_module_summary, training_loop.py:149-160); these
tests are the pytest equivalent with small dims so a 1-core CPU can
compile them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdetr_tpu.models.discriminator import Discriminator
from layoutdetr_tpu.models.generator import Generator, GeneratorConfig
from layoutdetr_tpu.models.layoutnet import LayoutNet
from layoutdetr_tpu.models.resnet import ResNet50
from layoutdetr_tpu.models.stylegan2 import Decoder, Encoder

TINY = GeneratorConfig(
    z_dim=4,
    num_bbox_labels=8,
    max_elements=3,
    hidden_dim=16,
    bert_f_dim=32,
    bert_num_heads=2,
    bert_num_encoder_layers=1,
    bert_num_decoder_layers=1,
    im_f_dim=16,
    max_text_length=16,
    vocab_size=64,
    bos_token_id=62,
    nhead=2,
    num_encoder_layers=1,
    num_decoder_layers=1,
    dim_feedforward=32,
    background_size=32,
)


def tiny_batch(b=2, n=3, t=8, s=32, rng=None):
    rng = rng or np.random.default_rng(0)
    return dict(
        z=jnp.asarray(rng.normal(size=(b, n, TINY.z_dim)).astype(np.float32)),
        bbox_class=jnp.asarray(rng.integers(0, 8, size=(b, n))),
        bbox_real=jnp.asarray(rng.uniform(0.1, 0.9, size=(b, n, 4)).astype(np.float32)),
        text_ids=jnp.asarray(rng.integers(1, 60, size=(b, n, t))),
        text_mask=jnp.asarray(np.ones((b, n, t), np.int32)),
        text_len=jnp.asarray(rng.integers(0, TINY.max_text_length, size=(b, n))),
        padding_mask=jnp.asarray(np.array([[False, False, True]] * b)),
        background=jnp.asarray(rng.normal(size=(b, s, s, 3)).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def batch():
    return tiny_batch()


def test_generator_shapes(batch):
    g = Generator(TINY)
    params = g.init(jax.random.PRNGKey(0), **batch, reconst=True)
    bbox = g.apply(params, **batch)
    assert bbox.shape == (2, 3, 4)
    assert np.all((np.asarray(bbox) >= 0) & (np.asarray(bbox) <= 1))

    out = g.apply(params, **batch, reconst=True)
    bbox, loss_z, logit_cls, loss_lm, loss_text_len = out
    assert bbox.shape == (2, 3, 4)
    assert logit_cls.shape == (2, 3, 8)
    for v in (loss_z, loss_lm, loss_text_len):
        assert np.isfinite(float(v))


def test_discriminator_shapes(batch):
    d = Discriminator(TINY)
    kwargs = {k: v for k, v in batch.items() if k not in ("z", "bbox_real")}
    kwargs["bbox"] = batch["bbox_real"]
    params = d.init(jax.random.PRNGKey(1), **kwargs, reconst=True)
    logit, logit_u = d.apply(params, **kwargs)
    assert logit.shape == (2,) and logit_u.shape == (2,)

    out = d.apply(params, **kwargs, reconst=True)
    (logit, logit_u, bbox_pred, logit_cls, loss_lm, loss_text_len,
     bg_rec, bbox_pred_u, logit_cls_u) = out
    assert bbox_pred.shape == (2, 3, 4)
    assert logit_cls.shape == (2, 3, 8)
    assert bg_rec.shape == (2, 32, 32, 3)
    assert bbox_pred_u.shape == (2, 3, 4)
    assert np.isfinite(float(loss_lm)) and np.isfinite(float(loss_text_len))


def test_resnet50_shapes():
    x = jnp.zeros((1, 64, 64, 3))
    m = ResNet50()
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 2, 2, 2048)


def test_stylegan2_decoder_encoder():
    dec = Decoder(z_dim=16, w_dim=32, img_resolution=16, img_channels=3,
                  channel_base=512, channel_max=32)
    z = jnp.zeros((2, 16))
    params = dec.init(jax.random.PRNGKey(0), z)
    img = dec.apply(params, z)
    assert img.shape == (2, 16, 16, 3)

    enc = Encoder(img_resolution=16, out_channels=8, channel_base=512, channel_max=32)
    p2 = enc.init(jax.random.PRNGKey(0), img)
    emb = enc.apply(p2, img)
    assert emb.shape == (2, 8)


def test_layoutnet_features():
    net = LayoutNet(num_label=13, d_model=16, nhead=2, num_layers=1)
    bbox = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (2, 4, 4)).astype(np.float32))
    label = jnp.asarray(np.random.default_rng(1).integers(0, 13, (2, 4)))
    pad = jnp.asarray(np.zeros((2, 4), bool))
    params = net.init(jax.random.PRNGKey(0), bbox, label, pad)
    feats = net.apply(params, bbox, label, pad, method=net.extract_features)
    assert feats.shape == (2, 16)
    logit_disc, logit_cls, bbox_pred = net.apply(params, bbox, label, pad)
    assert logit_disc.shape == (2,)
    assert logit_cls.shape == (2, 4, 13)
    assert bbox_pred.shape == (2, 4, 4)


def test_bert_remat_identical_outputs_and_grads():
    """cfg.remat wraps each BertLayer in jax.checkpoint — pure
    recompute-in-backward, so outputs AND grads must be bitwise-stable
    vs the unrematerialized stack (it only changes peak memory)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from layoutdetr_tpu.models.bert import BertConfig, BertLMHeadModel

    kw = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=48,
              max_position_embeddings=16, encoder_width=24)
    cfg_a = BertConfig(**kw)
    cfg_b = BertConfig(remat=True, **kw)

    ids = np.random.RandomState(0).randint(0, 64, (3, 10))
    am = np.ones((3, 10), np.int32)
    labels = np.where(np.arange(10)[None] < 7, ids, -100)
    enc = np.random.RandomState(1).randn(3, 5, 24).astype(np.float32)
    enc_mask = np.ones((3, 5), np.int32)

    model_a = BertLMHeadModel(cfg_a)
    model_b = BertLMHeadModel(cfg_b)
    params = model_a.init(jax.random.PRNGKey(0), ids, am, labels=labels,
                          encoder_hidden_states=enc,
                          encoder_attention_mask=enc_mask, mode="multimodal")

    def loss(m):
        def f(p):
            _, l = m.apply(p, ids, am, labels=labels,
                           encoder_hidden_states=enc,
                           encoder_attention_mask=enc_mask, mode="multimodal")
            return l
        return f

    la, ga = jax.value_and_grad(loss(model_a))(params)
    lb, gb = jax.value_and_grad(loss(model_b))(params)
    assert np.allclose(la, lb, rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

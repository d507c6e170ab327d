"""Numeric parity tests for torch->flax weight converters.

These double as end-to-end numerical validation of the BERT and
transformer-with-token reimplementations: random-initialized torch
models are converted and must produce matching outputs.
"""

import numpy as np
import pytest

import jax

from conftest import import_reference_module

torch = pytest.importorskip("torch")


def test_bert_encoder_parity_vs_hf():
    from transformers import BertConfig as HFBertConfig
    from transformers.models.bert.modeling_bert import BertModel as HFBertModel

    from layoutdetr_tpu.models.bert import BertConfig, BertModel
    from layoutdetr_tpu.utils.torch_convert import convert_bert_encoder

    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFBertModel(hf_cfg, add_pooling_layer=False).eval()
    # The reference's MED embeddings have no token-type table (med.py:55-97);
    # its from_pretrained load simply drops those weights. Zero them in HF
    # so both models compute the same function.
    hf.embeddings.token_type_embeddings.weight.data.zero_()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_bert_encoder(sd, num_layers=2, vocab_size=100)

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, add_cross_attention=False)
    model = BertModel(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 100, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0

    with torch.no_grad():
        want = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, ids, mask, mode="text"))
    # Padded positions differ (HF computes them; they're meaningless) — compare valid.
    np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[1, :6], want[1, :6], rtol=1e-4, atol=1e-5)


def test_bert_lm_head_parity_vs_hf():
    from transformers import BertConfig as HFBertConfig
    from transformers.models.bert.modeling_bert import BertLMHeadModel as HFBertLMHeadModel

    from layoutdetr_tpu.models.bert import BertConfig, BertLMHeadModel
    from layoutdetr_tpu.utils.torch_convert import convert_bert_lm_head

    hf_cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, is_decoder=True,
    )
    torch.manual_seed(1)
    hf = HFBertLMHeadModel(hf_cfg).eval()
    hf.bert.embeddings.token_type_embeddings.weight.data.zero_()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_bert_lm_head(sd, num_layers=2, vocab_size=100)

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, add_cross_attention=False)
    model = BertLMHeadModel(cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 100, size=(2, 8))
    mask = np.ones((2, 8), np.int64)

    with torch.no_grad():
        want = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, ids, mask, mode="text"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_layoutnet_parity_vs_reference():
    ref_ln = import_reference_module("training.networks_layoutnet")
    if ref_ln is None:
        pytest.skip("reference unavailable")

    from layoutdetr_tpu.models.layoutnet import LayoutNet
    from layoutdetr_tpu.utils.torch_convert import convert_layoutnet

    torch.manual_seed(2)
    ref = ref_ln.LayoutNet(num_label=13).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_layoutnet(sd, num_layers=4)

    net = LayoutNet(num_label=13)

    rng = np.random.default_rng(2)
    bbox = rng.uniform(0.1, 0.9, (2, 5, 4)).astype(np.float32)
    label = rng.integers(0, 13, (2, 5))
    pad = np.zeros((2, 5), bool)
    pad[1, 3:] = True

    with torch.no_grad():
        want = ref.extract_features(
            torch.from_numpy(bbox), torch.from_numpy(label), torch.from_numpy(pad)
        ).numpy()
    got = np.asarray(net.apply(
        {"params": params}, bbox, label, pad, method=net.extract_features))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnet50_converter_applies():
    """Structural check: a programmatically-built torchvision-shaped state
    dict converts and applies (numeric parity needs torchvision, absent)."""
    from layoutdetr_tpu.models.resnet import ResNet50
    from layoutdetr_tpu.utils.torch_convert import convert_resnet50

    rng = np.random.default_rng(3)
    sd = {}

    def conv(name, o, i, k):
        sd[name] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for stage, (blocks, width) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512)), 1):
        for b in range(blocks):
            t = f"layer{stage}.{b}"
            conv(f"{t}.conv1.weight", width, in_ch if b == 0 else width * 4, 1)
            bn(f"{t}.bn1", width)
            conv(f"{t}.conv2.weight", width, width, 3)
            bn(f"{t}.bn2", width)
            conv(f"{t}.conv3.weight", width * 4, width, 1)
            bn(f"{t}.bn3", width * 4)
            if b == 0:
                conv(f"{t}.downsample.0.weight", width * 4, in_ch, 1)
                bn(f"{t}.downsample.1", width * 4)
        in_ch = width * 4

    params = convert_resnet50(sd)
    model = ResNet50()
    x = np.zeros((1, 64, 64, 3), np.float32)
    ref_init = model.init(jax.random.PRNGKey(0), x)
    # Same tree structure as a fresh init.
    assert jax.tree_util.tree_structure(ref_init["params"]) == \
        jax.tree_util.tree_structure(jax.tree.map(np.asarray, params))
    y = model.apply({"params": params}, x)
    assert y.shape == (1, 2, 2, 2048)

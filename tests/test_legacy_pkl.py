"""Safe snapshot-pickle reader (utils/legacy_pkl.py) vs the reference's
own pickling machinery.

Builds real reference torch modules (networks_detr Generator /
Discriminator — including the persistence-decorated StyleGAN2
``bg_decoder``, whose pickling embeds source code), dumps them exactly
the way the reference training loop does (plain ``pickle.dump`` of live
modules, training_loop.py:396-411), and asserts the restricted unpickler
recovers byte-identical ``state_dict()`` contents WITHOUT importing the
module classes or executing the embedded StyleGAN2 source.
"""

import copy
import pickle

import numpy as np
import pytest

from conftest import import_reference_module

torch = pytest.importorskip("torch")

import tv_stub  # noqa: E402

tv_stub.install()

nd = import_reference_module("training.networks_detr")
med = import_reference_module("training.med")

pytestmark = pytest.mark.skipif(
    nd is None or med is None, reason="reference networks_detr unavailable"
)

from test_full_parity import (  # noqa: E402
    BG, BOS, HID, IM_F, PAD, T, VOCAB, BERT_F,
    _FakeTokenizer, _fixed_tokens, _patch_offline, _tiny_med_config,
)


def _build_reference_pair(monkeypatch, tmp_path):
    ids, tmask = _fixed_tokens()
    _patch_offline(monkeypatch, _FakeTokenizer(ids, tmask))
    torch.manual_seed(0)
    kw = dict(
        num_bbox_labels=8, img_channels=3, img_height=BG, img_width=BG,
        c_dim=0, hidden_dim=HID, med_config=_tiny_med_config(tmp_path),
        bert_f_dim=BERT_F, bert_num_encoder_layers=2, bert_num_decoder_layers=2,
        bert_num_heads=2, background_size=BG, im_f_dim=IM_F, max_text_length=T,
    )
    g = nd.Generator(z_dim=4, **kw).eval()
    d = nd.Discriminator(**kw).eval()
    return g, d


def test_load_network_pkl_roundtrip(monkeypatch, tmp_path):
    from layoutdetr_tpu.utils.legacy_pkl import infer_bert_layers, load_network_pkl

    g, d = _build_reference_pair(monkeypatch, tmp_path)
    g_ema = copy.deepcopy(g)
    snapshot = dict(G=g, D=d, G_ema=g_ema, augment_pipe=None,
                    training_set_kwargs={"path": "train.zip", "max_elements": 9})
    blob = pickle.dumps(snapshot)  # the reference's own dump path

    nets = load_network_pkl(blob)
    assert set(nets) == {"G", "D", "G_ema", "augment_pipe", "training_set_kwargs"}
    assert nets["augment_pipe"] is None
    assert nets["training_set_kwargs"]["max_elements"] == 9

    for key, module in [("G", g), ("D", d), ("G_ema", g_ema)]:
        want = {k: v.detach().numpy() for k, v in module.state_dict().items()}
        got = nets[key]["state_dict"]
        assert set(got) == set(want), (
            f"{key}: missing {sorted(set(want) - set(got))[:5]} "
            f"extra {sorted(set(got) - set(want))[:5]}")
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=f"{key}.{k}")

    layers = infer_bert_layers(nets["G_ema"]["state_dict"])
    assert layers == {"bert_encoder_layers": 2, "bert_decoder_layers": 2,
                      "vocab_size": VOCAB}

    # The extracted dict must feed the composite converter directly
    # (same path `torch_convert --kind generator --src snapshot.pkl` takes).
    from layoutdetr_tpu.utils.torch_convert import convert_generator

    params = convert_generator(nets["G_ema"]["state_dict"],
                               bert_encoder_layers=2, bert_decoder_layers=2,
                               vocab_size=VOCAB)
    ref_params = convert_generator(
        {k: v.detach().numpy() for k, v in g_ema.state_dict().items()},
        bert_encoder_layers=2, bert_decoder_layers=2, vocab_size=VOCAB)
    import jax

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(ref_params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_persistent_stylegan_submodule_not_executed(monkeypatch, tmp_path):
    """The StyleGAN2 bg_decoder pickles via persistence.__reduce__ with
    embedded module source; the safe reader must recover its tensors
    while never executing that source (no real class is constructed)."""
    from layoutdetr_tpu.utils.legacy_pkl import load_network_pkl

    _, d = _build_reference_pair(monkeypatch, tmp_path)
    blob = pickle.dumps(dict(G=None, D=d, G_ema=None))
    nets = load_network_pkl(blob)
    sd = nets["D"]["state_dict"]
    bg_keys = [k for k in sd if k.startswith("bg_decoder.")]
    assert bg_keys, "persistence-decorated submodule tensors missing"
    want = {k: v.detach().numpy() for k, v in d.state_dict().items()}
    for k in bg_keys:
        np.testing.assert_array_equal(sd[k], want[k])


def test_unknown_globals_never_execute():
    """A hostile reduce (os.system) must come back as an inert stub —
    the legacy.py loader would have executed it."""
    import os

    from layoutdetr_tpu.utils.legacy_pkl import SafeUnpickler, _Stub

    class Evil:
        def __reduce__(self):
            return (os.system, ("touch /tmp/legacy_pkl_pwned",))

    blob = pickle.dumps({"G": Evil()})
    import io

    data = SafeUnpickler(io.BytesIO(blob)).load()
    assert isinstance(data["G"], _Stub)
    assert type(data["G"])._stub_origin[1] == "system"
    assert not os.path.exists("/tmp/legacy_pkl_pwned")


def test_infer_generator_config_and_direct_pkl_load(monkeypatch, tmp_path):
    """`--ckpt snapshot.pkl` one-step load (checkpoint.load_generator_checkpoint):
    architecture recovered from the reference state-dict shapes, params
    identical to an explicit convert_generator run."""
    from layoutdetr_tpu.utils.checkpoint import load_generator_checkpoint
    from layoutdetr_tpu.utils.legacy_pkl import infer_generator_config
    from layoutdetr_tpu.utils.torch_convert import convert_generator

    g, _ = _build_reference_pair(monkeypatch, tmp_path)
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}

    inferred = infer_generator_config(sd)
    assert inferred["bert_f_dim"] == BERT_F
    assert inferred["z_dim"] == 4
    assert inferred["num_bbox_labels"] == 8
    assert inferred["max_text_length"] == T
    assert inferred["hidden_dim"] == HID
    assert inferred["im_f_dim"] == IM_F
    assert inferred["vocab_size"] == VOCAB
    assert inferred["bos_token_id"] == VOCAB - 2
    assert inferred["bert_num_encoder_layers"] == 2
    assert inferred["bert_num_decoder_layers"] == 2

    path = tmp_path / "snapshot.pkl"
    path.write_bytes(pickle.dumps(dict(G=None, G_ema=g, D=None)))
    params, gcfg = load_generator_checkpoint(str(path))
    assert gcfg.bert_f_dim == BERT_F and gcfg.vocab_size == VOCAB
    want = {"params": convert_generator(sd, bert_encoder_layers=2,
                                        bert_decoder_layers=2, vocab_size=VOCAB)}
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tokenizer_guard_rejects_pkl_under_hash_fallback(tmp_path):
    """Snapshot pkls always embed HF-trained BERT weights; pairing them
    with the offline hash tokenizer must fail loudly (tokenizer.py guard)."""
    from layoutdetr_tpu.data.tokenizer import LayoutTokenizer

    tok = LayoutTokenizer(max_length=16, vocab_dir=str(tmp_path / "novocab"))
    if tok.backend != "hash":
        pytest.skip("HF vocab present; guard not reachable")
    with pytest.raises(RuntimeError, match="WordPiece"):
        tok.require_hf_for_checkpoint("whatever/snapshot.pkl")


def test_nested_storage_blob_never_executes():
    """``torch.storage._load_from_bytes`` internally runs
    ``torch.load(weights_only=False)`` — a hostile pkl can nest an
    arbitrary-code pickle inside the storage blob where
    test_unknown_globals_never_execute can't see it. The reader must
    parse the blob itself and reject non-storage globals."""
    import io
    import os

    from layoutdetr_tpu.utils.legacy_pkl import SafeUnpickler

    class EvilStorage:
        def __reduce__(self):
            import torch.storage

            inner = pickle.dumps((os.system, ("touch /tmp/legacy_blob_pwned",)))
            return (torch.storage._load_from_bytes, (inner,))

    import torch.storage  # noqa: F401  (resolve the module for __reduce__)

    blob = pickle.dumps({"G": EvilStorage()})
    with pytest.raises(pickle.UnpicklingError):
        SafeUnpickler(io.BytesIO(blob)).load()
    assert not os.path.exists("/tmp/legacy_blob_pwned")


def test_safe_storage_blob_roundtrip():
    """Tensors plain-pickled the way the reference snapshots them
    (typed *and* untyped storage reduces) reconstruct exactly through
    the restricted storage-blob parser."""
    import io

    import torch

    from layoutdetr_tpu.utils.legacy_pkl import SafeUnpickler

    t = torch.arange(12, dtype=torch.float32).reshape(3, 4) * 0.5
    out = SafeUnpickler(io.BytesIO(pickle.dumps({"w": t}))).load()["w"]
    np.testing.assert_array_equal(out.numpy(), t.numpy())

    st = t.untyped_storage()
    fn, args = st.__reduce_ex__(2)[:2]
    from layoutdetr_tpu.utils.legacy_pkl import _safe_load_storage_from_bytes

    rebuilt = _safe_load_storage_from_bytes(args[0])
    assert bytes(rebuilt) == bytes(st)


def test_protocol3_builtins_set_unpickles():
    """Pickles written at protocol <= 3 emit ``builtins.set`` as a
    GLOBAL opcode (every nn.Module's ``_non_persistent_buffers_set``);
    the restricted unpickler must resolve it for real — a stub is truthy
    and breaks the ``n not in nonpersist`` walk in state_dict_of."""
    import io

    from layoutdetr_tpu.utils.legacy_pkl import SafeUnpickler, state_dict_of

    m = torch.nn.Module()
    m.register_buffer("keep", torch.ones(2))
    m.register_buffer("skip", torch.zeros(2), persistent=False)
    for proto in (2, 3, pickle.HIGHEST_PROTOCOL):
        obj = SafeUnpickler(io.BytesIO(pickle.dumps(m, protocol=proto))).load()
        sd = state_dict_of(obj)
        assert set(sd) == {"keep"}, f"protocol {proto}: {sorted(sd)}"
        np.testing.assert_array_equal(sd["keep"], np.ones(2, np.float32))

"""open_url utility (dnnlib/util.py:397-460 parity surface) and the
hash-tokenizer / converted-checkpoint guard."""

import json
import os

import numpy as np
import pytest


def test_open_url_local_path(tmp_path):
    from layoutdetr_tpu.utils.url import open_url

    p = tmp_path / "blob.bin"
    p.write_bytes(b"hello")
    with open_url(str(p)) as f:
        assert f.read() == b"hello"
    assert open_url(str(p), return_filename=True) == str(p)


def test_open_url_file_url(tmp_path):
    from layoutdetr_tpu.utils.url import is_url, open_url

    p = tmp_path / "blob.bin"
    p.write_bytes(b"data")
    url = "file://" + str(p)
    assert is_url(url, allow_file_urls=True)
    assert not is_url(url)  # http(s) only by default
    assert not is_url(str(p), allow_file_urls=True)
    with open_url(url) as f:
        assert f.read() == b"data"


def test_open_url_cache_hit(tmp_path, monkeypatch):
    """A pre-seeded cache entry is served without any network access."""
    import hashlib

    from layoutdetr_tpu.utils import url as url_mod

    monkeypatch.setenv("LAYOUTDETR_TPU_CACHE_DIR", str(tmp_path))
    fake_url = "https://example.invalid/weights.pkl"
    cache_dir = url_mod.make_cache_dir_path("downloads")
    md5 = hashlib.md5(fake_url.encode()).hexdigest()
    (tmp_path / "downloads" / f"{md5}_weights.pkl").write_bytes(b"cached!")
    with url_mod.open_url(fake_url) as f:
        assert f.read() == b"cached!"
    fn = url_mod.open_url(fake_url, return_filename=True)
    assert os.path.basename(fn).startswith(md5)


def test_make_cache_dir_path(tmp_path, monkeypatch):
    from layoutdetr_tpu.utils.url import make_cache_dir_path

    monkeypatch.setenv("LAYOUTDETR_TPU_CACHE_DIR", str(tmp_path))
    p = make_cache_dir_path("a", "b")
    assert p == str(tmp_path / "a" / "b") and os.path.isdir(p)


def test_tokenizer_guard_refuses_converted_ckpt(tmp_path):
    """Hash-fallback tokenizer + converted-torch checkpoint -> loud error
    (VERDICT r1 weak-8); untagged checkpoints remain fine."""
    from layoutdetr_tpu.data.tokenizer import LayoutTokenizer

    tok = LayoutTokenizer(max_length=16, vocab_dir=str(tmp_path / "novocab"))
    assert tok.backend == "hash"

    ckpt = str(tmp_path / "gen_ckpt")
    tok.require_hf_for_checkpoint(ckpt)  # no sidecar -> ok

    with open(ckpt + ".converted.json", "w") as f:
        json.dump({"converted_from_torch": True, "hf_token_ids": True}, f)
    with pytest.raises(RuntimeError, match="WordPiece"):
        tok.require_hf_for_checkpoint(ckpt)


def test_graft_partial_init():
    """graft() = the strict=False cold-start load (training_loop.py:138-140)."""
    import numpy as np

    from layoutdetr_tpu.utils.checkpoint import graft

    params = {"a": {"w": np.zeros((2, 2)), "b": np.zeros(2)}, "c": np.zeros(3)}
    pre = {"a": {"w": np.ones((2, 2))}, "unknown": {"x": np.ones(1)}}
    out = graft(params, pre)
    assert (out["a"]["w"] == 1).all()          # overlaid
    assert (out["a"]["b"] == 0).all()          # kept from init
    assert (out["c"] == 0).all()
    with pytest.raises(ValueError, match="shape mismatch"):
        graft(params, {"c": np.zeros(4)})

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


def test_evaluate_sweep_guards_every_snapshot(tmp_path, monkeypatch):
    """A mixed --ckpt list must hit the tokenizer guard on the LATER
    converted snapshot too, not just ckpts[0] (VERDICT r4 weak-6) — and
    before any metric computes on garbage ids."""
    import dataclasses
    import sys

    import jax
    import numpy as np
    from click.testing import CliRunner

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from test_models import TINY

    import evaluate as evaluate_cli
    from layoutdetr_tpu.data.synthetic import make_synthetic_zip
    from layoutdetr_tpu.metrics import metric_main
    from layoutdetr_tpu.models.generator import Generator
    from layoutdetr_tpu.utils.checkpoint import save_checkpoint

    val = make_synthetic_zip(str(tmp_path / "val.zip"), num_samples=2,
                             image_size=TINY.background_size)
    cfg = dataclasses.replace(TINY, max_elements=9)
    g = Generator(cfg)
    batch = dict(
        z=np.zeros((1, 9, cfg.z_dim), np.float32),
        bbox_class=np.zeros((1, 9), np.int64),
        bbox_real=np.full((1, 9, 4), 0.5, np.float32),
        text_ids=np.ones((1, 9, cfg.max_text_length), np.int64),
        text_mask=np.ones((1, 9, cfg.max_text_length), np.int32),
        text_len=np.zeros((1, 9), np.int64),
        padding_mask=np.zeros((1, 9), bool),
        background=np.zeros((1, cfg.background_size, cfg.background_size, 3), np.float32),
    )
    params = g.init(jax.random.PRNGKey(0), **batch, reconst=True)
    paths = []
    for name in ("snap-a", "snap-b"):
        p = str(tmp_path / name)
        save_checkpoint(p, params)
        with open(p + ".gcfg.json", "w") as f:
            json.dump(dataclasses.asdict(cfg), f)
        paths.append(p)
    # Snapshot B claims converted-from-torch provenance (HF ids).
    with open(paths[1] + ".converted.json", "w") as f:
        json.dump({"converted_from_torch": True, "hf_token_ids": True}, f)

    calls = []
    monkeypatch.setattr(metric_main, "calc_metric",
                        lambda m, **kw: calls.append(m) or {"results": {}, "metric": m})
    monkeypatch.setattr(metric_main, "report_metric", lambda *a, **kw: None)

    result = CliRunner().invoke(
        evaluate_cli.main,
        ["--ckpt", ",".join(paths), "--data", val,
         "--metrics", "layout_fid50k_val",
         "--max-text-length", str(cfg.max_text_length),
         "--background-size", str(cfg.background_size),
         "--run-dir", str(tmp_path)],
        catch_exceptions=True)
    # Snapshot A evaluated, snapshot B refused by the guard.
    assert calls == ["layout_fid50k_val"]
    assert result.exit_code != 0
    assert "WordPiece" in str(result.exception or result.output)

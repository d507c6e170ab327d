"""Data pipeline tests: synthetic zip -> loader -> device-ready batches."""

import numpy as np

from layoutdetr_tpu.data.dataset import InfiniteSampler, LayoutDataset
from layoutdetr_tpu.data.synthetic import make_synthetic_zip
from layoutdetr_tpu.data.tokenizer import CLS_ID, DEC_ID, PAD_ID, SEP_ID, LayoutTokenizer


def test_tokenizer_shapes_and_specials():
    tok = LayoutTokenizer(max_length=16)
    ids, mask, lens = tok.encode_batch(["hello world", "", "a b c d"])
    assert ids.shape == (3, 16) and mask.shape == (3, 16)
    assert ids[0, 0] == CLS_ID
    assert SEP_ID in ids[0]
    assert lens[0] == len("hello world")
    # Empty string still gets CLS/SEP (reference pads texts with '').
    assert ids[1, 0] == CLS_ID and ids[1, 1] == SEP_ID and ids[1, 2] == PAD_ID
    assert lens[1] == 0
    # Deterministic.
    ids2, _, _ = tok.encode_batch(["hello world"])
    np.testing.assert_array_equal(ids[0], ids2[0])
    assert tok.bos_token_id == DEC_ID


def test_dataset_roundtrip(tmp_path):
    zip_path = make_synthetic_zip(str(tmp_path / "train.zip"), num_samples=3, image_size=32)
    ds = LayoutDataset(zip_path, background_size=32, max_text_length=16)
    assert len(ds) == 3
    assert ds.num_bbox_labels == 8
    item = ds[0]
    assert item["bboxes"].shape == (9, 4)
    assert item["labels"].shape == (9,)
    assert item["text_ids"].shape == (9, 16)
    assert item["mask"].dtype == bool and item["mask"].any()
    assert item["background"].shape == (32, 32, 3)
    # Padded slots are zero/empty.
    n_real = int(item["mask"].sum())
    assert np.all(item["bboxes"][n_real:] == 0)

    batch = ds.collate([0, 1])
    assert batch["background"].shape == (2, 32, 32, 3)
    assert batch["text_ids"].shape == (2, 9, 16)
    assert "texts" not in batch  # device-ready: no python strings


def test_dataset_patches_opt_in(tmp_path):
    zip_path = make_synthetic_zip(str(tmp_path / "train.zip"), num_samples=2, image_size=32)
    ds = LayoutDataset(zip_path, background_size=32, load_patches=True)
    item = ds[0]
    assert item["patches"].shape == (9, 256, 256, 3)
    assert item["patch_masks"].shape[0] == 9


def test_infinite_sampler_rank_partition():
    s0 = InfiniteSampler(10, rank=0, num_replicas=2, seed=1)
    s1 = InfiniteSampler(10, rank=1, num_replicas=2, seed=1)
    it0, it1 = iter(s0), iter(s1)
    a = [next(it0) for _ in range(20)]
    b = [next(it1) for _ in range(20)]
    assert all(0 <= i < 10 for i in a + b)
    # Deterministic given the seed.
    a2 = [next(iter(InfiniteSampler(10, rank=0, num_replicas=2, seed=1))) for _ in range(1)]
    assert a2[0] == a[0]

"""Device-resident data feed (data/device_cache.py): the gathered
in-jit batch must be the exact host-collate batch, per sampler index."""

import numpy as np
import pytest

import jax

from layoutdetr_tpu.data.dataset import InfiniteSampler, LayoutDataset
from layoutdetr_tpu.data.device_cache import (
    DeviceDatasetCache,
    estimate_bytes,
    gather_batch,
    should_enable,
)
from layoutdetr_tpu.data.synthetic import make_synthetic_zip
from layoutdetr_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    zip_path = make_synthetic_zip(
        str(tmp_path_factory.mktemp("dfeed") / "train.zip"),
        num_samples=6, image_size=32)
    return LayoutDataset(zip_path, background_size=32, max_text_length=16)


def test_gather_matches_host_collate(ds):
    mesh = make_mesh(2)
    cache = DeviceDatasetCache(ds, mesh)
    gather = jax.jit(gather_batch)

    sampler = InfiniteSampler(len(ds), seed=3)
    it = iter(sampler)
    for _ in range(3):
        idxs = [next(it) for _ in range(4)]
        dev = jax.device_get(gather(cache.arrays, cache.put_indices(idxs)))
        host = ds.collate(idxs)
        # Identical decode products -> identical batches. Background is
        # the same (u8/255 - mean)/std arithmetic on device; float32
        # reassociation only.
        np.testing.assert_allclose(dev["background"], host["background"],
                                   atol=1e-6)
        for k in ("bboxes", "text_ids", "text_mask", "text_len"):
            np.testing.assert_array_equal(dev[k], host[k])
        np.testing.assert_array_equal(dev["labels"], host["labels"])  # i32 vs i64 values
        np.testing.assert_array_equal(dev["mask"], host["mask"])
        np.testing.assert_array_equal(dev["padding_mask"], host["padding_mask"])


def test_batch_axis_sharded_over_data(ds):
    mesh = make_mesh(2)
    cache = DeviceDatasetCache(ds, mesh)
    idx = cache.put_indices([0, 1, 2, 3])
    assert idx.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        idx.ndim)
    out = jax.jit(gather_batch)(cache.arrays, idx)
    # The gathered batch keeps the batch axis on the data mesh axis (no
    # silent replication of the per-step batch).
    spec = out["background"].sharding.spec
    assert spec[0] == "data", spec


def test_should_enable_budget_gate(ds):
    assert should_enable(ds, "on") is True
    assert should_enable(ds, "off") is False
    assert should_enable(ds, "auto", budget_gb=1.0) is True  # tiny set fits
    assert should_enable(ds, "auto", budget_gb=estimate_bytes(ds) / 2**30 / 2) is False


def test_device_feed_rejected_with_load_patches(ds, tmp_path):
    from layoutdetr_tpu.training.train_loop import training_loop

    with pytest.raises(ValueError, match="load_patches"):
        training_loop(run_dir=str(tmp_path), data=ds._path,
                      load_patches=True, device_feed="on")

"""Benchmark data loader: the HDF5 branch (ann-benchmarks file layout,
ann_benchmark_data.rs:36-82) and the harness metrics on top of it.

No egress exists in CI, so the fixture builds a small HDF5 file with the
exact ann-benchmarks schema (train/test/neighbors/distances) and checks the
loader prefers it over the synthetic fallback."""

import numpy as np
import pytest

from quantization_tpu.bench.ann_data import (
    AnnBenchmarkData,
    DatasetSpec,
    cosine_preprocess,
    test_knn as run_knn,  # alias: pytest must not collect the harness fn
)
from quantization_tpu.core.types import DistanceType

h5py = pytest.importorskip("h5py")


@pytest.fixture()
def hdf5_dataset(tmp_path, rng):
    n, q, dim, gt_k = 600, 16, 32, 100
    train = rng.standard_normal((n, dim)).astype(np.float32)
    test = rng.standard_normal((q, dim)).astype(np.float32)
    # Exact angular ground truth, computed the way ann-benchmarks does:
    # cosine distance on normalized rows.
    tn = cosine_preprocess(train)
    qn = cosine_preprocess(test)
    sims = qn @ tn.T
    neighbors = np.argsort(-sims, axis=1)[:, :gt_k].astype(np.int64)
    distances = 1.0 - np.take_along_axis(sims, neighbors, axis=1)
    path = tmp_path / "unit-32-angular.hdf5"
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=train)
        f.create_dataset("test", data=test)
        f.create_dataset("neighbors", data=neighbors)
        f.create_dataset("distances", data=distances)
    spec = DatasetSpec(
        "unit-32-angular", "unit-32-angular.hdf5", dim, DistanceType.DOT
    )
    return spec, tmp_path, train, test, neighbors


def test_load_prefers_local_hdf5(hdf5_dataset):
    spec, data_dir, train, test, neighbors = hdf5_dataset
    data = AnnBenchmarkData.load(spec, data_dir=str(data_dir))
    assert data.name == spec.name  # not "<name>-synthetic"
    np.testing.assert_array_equal(data.train, train)
    np.testing.assert_array_equal(data.test, test)
    np.testing.assert_array_equal(data.neighbors, neighbors)


def test_load_synthetic_fallback_when_file_missing(tmp_path):
    spec = DatasetSpec("unit-32-angular", "nope.hdf5", 32, DistanceType.DOT)
    data = AnnBenchmarkData.load(
        spec, data_dir=str(tmp_path), synthetic_count=500, synthetic_queries=8
    )
    assert data.name.endswith("-synthetic")
    assert data.train.shape == (500, 32)


def test_knn_harness_on_hdf5_data(hdf5_dataset):
    """End-to-end: HDF5 load -> cosine preprocess -> SQ encode -> recall.
    8-bit SQ on a 600-point corpus must recover nearly all of the exact
    top-10 (the reference's same_10 acceptance regime)."""
    from quantization_tpu import ScalarQuantizerU8, VectorParameters

    spec, data_dir, *_ = hdf5_dataset
    data = AnnBenchmarkData.load(spec, data_dir=str(data_dir))
    data.preprocess_cosine()
    params = VectorParameters(
        spec.dim, data.train.shape[0], DistanceType.DOT, False
    )
    enc = ScalarQuantizerU8.encode(data.train, params)
    res = run_knn(data, enc, query_batch=16)
    assert res.same_10 >= 0.9
    assert res.same_30 >= 0.9
    t = res.timings()
    assert t["min_us"] <= t["p95_us"] <= t["max_us"]

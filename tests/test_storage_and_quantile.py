"""Storage seam + quantile calibration unit tests (reference
encoded_storage.rs size validation; quantile.rs guards)."""

import numpy as np
import pytest

from quantization_tpu.core.storage import EncodedStorage, EncodedStorageBuilder
from quantization_tpu.core.types import StorageIOError
from quantization_tpu.ops.quantile import (
    find_min_max_batches,
    find_quantile_interval,
    sample_rows,
)


def test_builder_roundtrip(tmp_path):
    b = EncodedStorageBuilder(4)
    b.push_vector_data(bytes([1, 2, 3, 4]))
    b.push_batch(np.arange(8, dtype=np.uint8).reshape(2, 4))
    st = b.build()
    assert st.count == 3 and st.row_size == 4
    np.testing.assert_array_equal(st.get_vector_data(0), [1, 2, 3, 4])
    path = tmp_path / "blob.bin"
    st.save_to_file(path)
    st2 = EncodedStorage.from_file(path, 4, 3)
    np.testing.assert_array_equal(st.data, st2.data)
    st3 = EncodedStorage.from_file(path, 4, 3, mmap=True)
    np.testing.assert_array_equal(st.data, st3.data)


def test_size_validation(tmp_path):
    path = tmp_path / "blob.bin"
    path.write_bytes(bytes(10))
    with pytest.raises(StorageIOError):
        EncodedStorage.from_file(path, 4, 3)  # expects 12
    with pytest.raises(StorageIOError):
        EncodedStorage.from_file(tmp_path / "missing.bin", 4, 3)


def test_builder_rejects_wrong_row_size():
    b = EncodedStorageBuilder(4)
    with pytest.raises(StorageIOError):
        b.push_vector_data(bytes([1, 2, 3]))


def test_min_max_batches():
    batches = [np.array([[1.0, -5.0]]), np.array([[7.0, 0.0]])]
    assert find_min_max_batches(iter(batches)) == (-5.0, 7.0)
    assert find_min_max_batches(iter([])) == (0.0, 0.0)


def test_quantile_guards(rng):
    sample = rng.random((200, 8), dtype=np.float32)
    # count below the 127 threshold (quantile.rs:27)
    assert find_quantile_interval(sample, 100, 0.9) is None
    # quantile >= 1.0 (quantile.rs:27)
    assert find_quantile_interval(sample, 1000, 1.0) is None
    # valid case narrows the interval
    lo, hi = find_quantile_interval(sample, 1000, 0.5)
    assert 0.0 < lo < hi < 1.0
    full_lo, full_hi = float(sample.min()), float(sample.max())
    assert lo > full_lo and hi < full_hi


def test_quantile_tightens_with_lower_quantile(rng):
    sample = rng.standard_normal((1000, 4)).astype(np.float32)
    l1, h1 = find_quantile_interval(sample, 5000, 0.99)
    l2, h2 = find_quantile_interval(sample, 5000, 0.80)
    assert l2 >= l1 and h2 <= h1


def test_sample_rows_streaming(rng):
    data = rng.random((1000, 3), dtype=np.float32)

    def batches():
        for i in range(0, 1000, 130):
            yield data[i : i + 130]

    s = sample_rows(batches, 1000, 100, seed=1)
    assert s.shape == (100, 3)
    # every sampled row must exist in the data
    idx = {tuple(r) for r in data.round(6).tolist()}
    for r in s.round(6).tolist():
        assert tuple(r) in idx
    # full take when sample >= count
    s2 = sample_rows(batches, 1000, 2000, seed=1)
    assert s2.shape == (1000, 3)
    np.testing.assert_array_equal(s2, data)

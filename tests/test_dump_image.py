"""PQ debug-visualization test (reference `dump_image` feature,
encoded_vectors_pq.rs:344-403)."""

import os

import numpy as np

from quantization_tpu.core.types import DistanceType, VectorParameters
from quantization_tpu.models.pq import ProductQuantizer


def test_pq_dump_to_image(tmp_path, rng):
    n, dim = 400, 8
    data = rng.random((n, dim), dtype=np.float32)
    enc = ProductQuantizer.encode(
        data, VectorParameters(dim, n, DistanceType.L2, False), chunk_size=2
    )
    paths = enc.dump_to_image(data, prefix=str(tmp_path / "kmeans"))
    assert len(paths) == 4  # 4 chunks of width 2
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0

    from PIL import Image

    img = np.asarray(Image.open(paths[0]))
    assert img.shape == (1000, 1000, 3)
    # red centroid markers present
    assert ((img[:, :, 0] == 255) & (img[:, :, 1] == 0)).any()

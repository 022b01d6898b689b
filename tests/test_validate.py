"""validate_vector_parameters: direct and as wired into every encode path
(the reference guards encoders with it under debug_assert!,
encoded_vectors_u8.rs:56, encoded_vectors_pq.rs:64, encoded_vectors_binary.rs:171)."""

import numpy as np
import pytest

from quantization_tpu import (
    ArgumentsError,
    BinaryQuantizer,
    DistanceType,
    ProductQuantizer,
    ScalarQuantizerU8,
    VectorParameters,
)
from quantization_tpu.core.interface import validate_vector_parameters


def test_validate_direct_array(rng):
    data = rng.random((10, 8), dtype=np.float32)
    validate_vector_parameters(data, VectorParameters(8, 10, DistanceType.DOT, False))
    with pytest.raises(ArgumentsError):
        validate_vector_parameters(
            data, VectorParameters(9, 10, DistanceType.DOT, False)
        )
    with pytest.raises(ArgumentsError):
        validate_vector_parameters(
            data, VectorParameters(8, 11, DistanceType.DOT, False)
        )


def test_validate_direct_stream(rng):
    data = rng.random((10, 8), dtype=np.float32)

    def stream():
        yield data[:6]
        yield data[6:]

    validate_vector_parameters(
        lambda: stream(), VectorParameters(8, 10, DistanceType.DOT, False)
    )
    with pytest.raises(ArgumentsError):
        validate_vector_parameters(
            lambda: stream(), VectorParameters(8, 9, DistanceType.DOT, False)
        )


@pytest.mark.parametrize(
    "encode",
    [
        lambda d, p: ScalarQuantizerU8.encode(d, p),
        lambda d, p: BinaryQuantizer.encode(d, p),
        lambda d, p: ProductQuantizer.encode(d, p, chunk_size=2),
    ],
    ids=["sq", "bq", "pq"],
)
def test_encode_rejects_mismatched_params(rng, encode):
    data = rng.random((10, 8), dtype=np.float32)
    with pytest.raises(ArgumentsError):
        encode(data, VectorParameters(9, 10, DistanceType.DOT, False))
    with pytest.raises(ArgumentsError):
        encode(data, VectorParameters(8, 12, DistanceType.DOT, False))

"""quantization_tpu — TPU-native vector quantization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
qdrant/quantization: compress float32 embedding corpora into scalar-u8,
product-quantization, or binary codes, and score query batches against them
with MXU/VPU kernels, preserving the reference's "bigger score = better unless
``invert``" contract — batched, jittable, and shardable over TPU meshes.
"""

from .core.types import (
    ArgumentsError,
    DistanceType,
    EncodingError,
    QuantizationError,
    StoppedError,
    StorageIOError,
    VectorParameters,
)
from .core.distances import distance, pairwise, pairwise_score, score
from .core.interface import EncodedVectors, validate_vector_parameters
from .core.storage import EncodedStorage, EncodedStorageBuilder
from .models.sq import EncodedQueryU8, EncodedVectorsU8, ScalarQuantizerU8

__all__ = [
    "ArgumentsError",
    "DistanceType",
    "EncodedQueryU8",
    "EncodedStorage",
    "EncodedStorageBuilder",
    "EncodedVectors",
    "EncodedVectorsU8",
    "EncodingError",
    "QuantizationError",
    "ScalarQuantizerU8",
    "StoppedError",
    "StorageIOError",
    "VectorParameters",
    "distance",
    "pairwise",
    "pairwise_score",
    "score",
    "validate_vector_parameters",
]

__version__ = "0.1.0"

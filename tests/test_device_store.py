"""DeviceAppender: streaming in-place accumulation (utils/device_store.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu.utils.device_store import DeviceAppender


def test_appender_roundtrip(rng):
    app = DeviceAppender((10, 4), jnp.int8)
    a = rng.integers(-5, 5, (3, 4)).astype(np.int8)
    b = rng.integers(-5, 5, (5, 4)).astype(np.int8)
    app.append(jnp.asarray(a))
    app.append(jnp.asarray(b))
    assert app.pos == 8
    out = np.asarray(app.finish())
    np.testing.assert_array_equal(out[:3], a)
    np.testing.assert_array_equal(out[3:8], b)
    np.testing.assert_array_equal(out[8:], 0)


def test_appender_1d_fill():
    app = DeviceAppender((6,), jnp.float32, fill=-1.0)
    app.append(jnp.ones((2,), jnp.float32))
    out = np.asarray(app.finish())
    np.testing.assert_array_equal(out, [1, 1, -1, -1, -1, -1])


def test_appender_overflow():
    app = DeviceAppender((4, 2), jnp.float32)
    app.append(jnp.zeros((3, 2), jnp.float32))
    with pytest.raises(ValueError):
        app.append(jnp.zeros((2, 2), jnp.float32))


def test_appender_dtype_cast():
    app = DeviceAppender((2, 2), jnp.int8)
    app.append(jnp.asarray([[1.0, 2.0], [3.0, 4.0]], jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(app.finish()), [[1, 2], [3, 4]]
    )

"""Top-k selection tests: blocked exact two-stage equals flat lax.top_k."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu.ops.topk import top_k, topk_exact


def test_hierarchical_merge_matches_flat(rng, monkeypatch):
    """ktile._merge blocks huge candidate widths; result must equal a flat
    top-k over the same candidates."""
    import jax.numpy as jnp

    from quantization_tpu.ops.pallas import ktile

    monkeypatch.setattr(ktile, "_MERGE_BLOCK", 256)
    q, nt, k = 3, 16, 7  # width = nt*SLOT = 2048 >> block
    vals = rng.standard_normal((q, nt * ktile.SLOT)).astype(np.float32)
    idxs = rng.permutation(nt * ktile.SLOT)[None, :].repeat(q, 0).astype(np.int32)
    s, i = ktile.merge_tile_topk_all(jnp.asarray(vals), jnp.asarray(idxs), k)
    ws, wp = topk_exact(jnp.asarray(vals), k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ws), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(i), np.take_along_axis(idxs, np.asarray(wp), axis=1)
    )


@pytest.mark.parametrize("n", [10, 2048, 5000, 10001])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_topk_exact_matches_flat(rng, n, k):
    scores = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    s, i = topk_exact(scores, k)
    s_ref, i_ref = jax.lax.top_k(scores, min(k, n))
    kk = min(k, n)
    np.testing.assert_array_equal(np.asarray(s)[:, :kk], np.asarray(s_ref))
    # indices may differ on exact ties; values gathered must match
    gathered = np.take_along_axis(np.asarray(scores), np.asarray(i)[:, :kk], 1)
    np.testing.assert_array_equal(gathered, np.asarray(s_ref))
    assert s.shape == (3, k) and i.shape == (3, k)


def test_topk_k_larger_than_n(rng):
    scores = jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))
    s, i = topk_exact(scores, 8)
    assert s.shape == (2, 8)
    assert np.all(np.isneginf(np.asarray(s)[:, 5:]))
    # missing-slot sentinel is -1 (same contract as the fused-kernel merge),
    # never a valid corpus id like 0
    assert np.all(np.asarray(i)[:, 5:] == -1)


def test_topk_dispatch(rng):
    scores = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
    s, i = top_k(scores, 5, method="exact")
    assert s.shape == (2, 5)
    with pytest.raises(ValueError):
        top_k(scores, 5, method="bogus")

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from faster_whisper_tpu.ops.reorder import reorder_beam_cache, reorder_cache  # noqa: E402


def _ref(cache, parent):
    g, b, k = cache.shape[:3]
    out = np.empty_like(cache)
    for bb in range(b):
        for kk in range(k):
            out[:, bb, kk] = cache[:, bb, parent[bb, kk]]
    return out


@pytest.mark.parametrize("shape", [(4, 2, 5, 16, 2, 8), (2, 3, 2, 8)])
def test_reorder_kernel_interpret(shape):
    rng = np.random.default_rng(0)
    cache = rng.standard_normal(shape).astype(np.float32)
    b, k = shape[1], shape[2]
    parent = rng.integers(0, k, size=(b, k)).astype(np.int32)

    got = np.asarray(
        reorder_beam_cache(jnp.asarray(cache), jnp.asarray(parent), interpret=True)
    )
    np.testing.assert_array_equal(got, _ref(cache, parent))


def test_reorder_dispatch_fallback():
    rng = np.random.default_rng(1)
    cache = rng.standard_normal((3, 2, 4, 8, 2)).astype(np.float32)
    parent = rng.integers(0, 4, size=(2, 4)).astype(np.int32)
    got = np.asarray(reorder_cache(jnp.asarray(cache), jnp.asarray(parent)))
    np.testing.assert_allclose(got, _ref(cache, parent), atol=1e-6)


def test_reorder_lazy_chunked_matches_full_on_filled_region():
    rng = np.random.default_rng(2)
    cache = rng.standard_normal((3, 2, 4, 32, 2)).astype(np.float32)
    parent = rng.integers(0, 4, size=(2, 4)).astype(np.int32)

    for filled in (0, 1, 7, 8, 9, 31, 32):
        got = np.asarray(
            reorder_cache(
                jnp.asarray(cache), jnp.asarray(parent),
                filled=jnp.asarray(filled), chunk=8,
            )
        )
        want = _ref(cache, parent)
        n_active = min(-(-filled // 8) * 8, 32)
        # reordered up to the chunk boundary covering `filled`…
        np.testing.assert_allclose(got[:, :, :, :n_active], want[:, :, :, :n_active])
        # …and untouched beyond it
        np.testing.assert_allclose(got[:, :, :, n_active:], cache[:, :, :, n_active:])


def test_reorder_identity():
    cache = np.arange(2 * 2 * 3 * 4, dtype=np.float32).reshape(2, 2, 3, 4)
    parent = np.tile(np.arange(3, dtype=np.int32), (2, 1))
    got = np.asarray(reorder_cache(jnp.asarray(cache), jnp.asarray(parent)))
    np.testing.assert_array_equal(got, cache)

import numpy as np
import pytest

from faster_whisper_tpu.models.engine import dtw_path, _median_filter_time
from faster_whisper_tpu.transcribe import merge_punctuations


def test_dtw_diagonal():
    # a clean diagonal cost field aligns text i ~ time i
    n, m = 10, 10
    cost = np.ones((n, m))
    np.fill_diagonal(cost, 0.0)
    text_idx, time_idx = dtw_path(cost)
    # path is monotonic and covers both axes fully
    assert text_idx[0] == 0 and time_idx[0] == 0
    assert text_idx[-1] == n - 1 and time_idx[-1] == m - 1
    assert (np.diff(text_idx) >= 0).all()
    assert (np.diff(time_idx) >= 0).all()
    # on a diagonal field the path should be exactly the diagonal
    on_diag = sum(1 for a, b in zip(text_idx, time_idx) if a == b)
    assert on_diag == n


def test_dtw_stretched():
    # 3 tokens over 9 frames: token k should occupy frames 3k..3k+2
    cost = np.ones((3, 9))
    for k in range(3):
        cost[k, 3 * k : 3 * k + 3] = 0.0
    text_idx, time_idx = dtw_path(cost)
    # first frame where each token appears
    starts = [time_idx[np.argmax(text_idx == k)] for k in range(3)]
    assert starts == [0, 3, 6]


def test_dtw_rect_monotonic():
    rng = np.random.default_rng(0)
    cost = rng.random((7, 23))
    text_idx, time_idx = dtw_path(cost)
    assert (np.diff(text_idx) >= 0).all()
    assert (np.diff(time_idx) >= 0).all()
    # every step advances at least one axis, never both backwards
    steps = set(zip(np.diff(text_idx).tolist(), np.diff(time_idx).tolist()))
    assert steps <= {(0, 1), (1, 0), (1, 1)}


def test_median_filter_time():
    x = np.array([[0.0, 0, 10, 0, 0, 0, 0, 0]])
    y = _median_filter_time(x, 3)
    # lone spike removed by the median
    assert y[0, 2] == 0.0
    assert _median_filter_time(x, 1) is x


def test_merge_punctuations_prepend():
    alignment = [
        {"word": " “", "tokens": [1]},
        {"word": "Hello", "tokens": [2]},
        {"word": " world", "tokens": [3]},
    ]
    merge_punctuations(alignment, "\"'“¿([{-", "\"'.。,，!！?？:：”)]}、")
    assert alignment[0]["word"] == ""
    assert alignment[1]["word"] == " “Hello"
    assert alignment[1]["tokens"] == [1, 2]


def test_merge_punctuations_append():
    alignment = [
        {"word": " hi", "tokens": [1]},
        {"word": ",", "tokens": [2]},
        {"word": " there", "tokens": [3]},
        {"word": ".", "tokens": [4]},
    ]
    merge_punctuations(alignment, "\"'“¿([{-", "\"'.。,，!！?？:：”)]}、")
    assert alignment[0]["word"] == " hi,"
    assert alignment[0]["tokens"] == [1, 2]
    assert alignment[2]["word"] == " there."
    assert alignment[2]["tokens"] == [3, 4]
    assert alignment[1]["word"] == "" and alignment[3]["word"] == ""


def test_alignment_synthetic_diagonal_attention():
    """engine.align on a crafted model is hard; instead check the math
    pipeline from qk scores to word times using the public pieces."""
    # 4 text tokens + eot over 100 frames; attention concentrated at
    # frames 10, 30, 50, 70, 90
    n_tok, n_frames = 5, 100
    centers = [10, 30, 50, 70, 90]
    w = np.zeros((1, n_tok, n_frames))
    for i, c in enumerate(centers):
        w[0, i, max(0, c - 5) : c + 5] = 5.0  # wide enough to survive medfilt
    w = np.exp(w) / np.exp(w).sum(-1, keepdims=True)
    mean = w.mean(-2, keepdims=True)
    std = w.std(-2, keepdims=True) + 1e-9
    w = (w - mean) / std
    w = _median_filter_time(w, 7)
    matrix = w.mean(0)
    text_idx, time_idx = dtw_path(-matrix)
    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    jump_times = time_idx[jumps]
    # each token's start frame should be at/near its attention center
    for i, c in enumerate(centers[:-1]):
        assert abs(jump_times[i] - c) <= 12


def test_device_align_chain_matches_host_oracle():
    """The fused on-device DTW-matrix recipe (_align_head_chain, run per
    head inside _align_forward_post) must match the host oracle
    alignment_matrix — including content boundaries t_frames < T, where
    the median filter's mirror padding sits at each item's boundary."""
    import jax.numpy as jnp

    from faster_whisper_tpu.models.engine import (
        _align_head_chain,
        alignment_matrix,
    )

    rng = np.random.default_rng(3)
    B, K, S, T = 3, 4, 24, 96
    qk = rng.standard_normal((B, K, S, T)).astype(np.float32) * 2.0
    row_start = np.array([2, 4, 2], np.int32)
    n_rows = np.array([10, 7, 20], np.int32)
    t_frames = np.array([96, 50, 33], np.int32)  # incl. full-T item

    # device path: per-head chain summed over heads / K
    acc = np.zeros((B, S, T), np.float32)
    for k in range(K):
        acc += np.asarray(
            _align_head_chain(
                jnp.asarray(qk[:, k]),
                jnp.asarray(row_start),
                jnp.asarray(n_rows),
                jnp.asarray(t_frames),
                7,
            )
        )
    device = acc / K

    for b in range(B):
        lo, n = int(row_start[b]), int(n_rows[b])
        tf = int(t_frames[b])
        want = alignment_matrix(qk[b, :, lo : lo + n, :], tf, 7)
        got = device[b, lo : lo + n, :tf]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_dtw_matches_numpy():
    """native/dtw.cpp must be bit-identical to the numpy oracle —
    including tie-breaks (diag, then insertion) — on random and
    degenerate matrices."""
    from faster_whisper_tpu.dtw_native import dtw_native
    from faster_whisper_tpu.models.engine import _dtw_path_numpy

    rng = np.random.default_rng(11)
    cases = [
        rng.standard_normal((1, 1)),
        rng.standard_normal((1, 9)),
        rng.standard_normal((7, 1)),
        rng.standard_normal((13, 40)),
        rng.standard_normal((130, 750)),
        np.zeros((5, 5)),  # full ties: tie-break order must match
        np.tile(rng.standard_normal((1, 20)), (6, 1)),  # row ties
    ]
    checked = 0
    for cost in cases:
        native = dtw_native(cost)
        if native is None:
            pytest.skip("native DTW unavailable (no toolchain)")
        want_t, want_f = _dtw_path_numpy(cost)
        np.testing.assert_array_equal(native[0], want_t)
        np.testing.assert_array_equal(native[1], want_f)
        checked += 1
    assert checked == len(cases)

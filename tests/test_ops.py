"""Unit tests for core ops: distances, masked softmax, sparse pipeline.

Strategy per SURVEY.md §4: every kernel is checked against a dense
einsum/numpy oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tagan_tpu.ops import distances as D
from tagan_tpu.ops import sparse as S
from tagan_tpu.ops.masked import masked_softmax, masked_mean, masked_max


HEADS, N, DH = 3, 10, 8


@pytest.fixture
def qk(rng):
    q = jnp.asarray(rng.standard_normal((HEADS, N, DH)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((HEADS, N, DH)), jnp.float32)
    return q, k


def dense_oracle(metric, q, k):
    """Naive per-pair loop oracle in numpy."""
    q, k = np.asarray(q, np.float64), np.asarray(k, np.float64)
    out = np.zeros((HEADS, N, N))
    for h in range(HEADS):
        for i in range(N):
            for j in range(N):
                x, y = q[h, i], k[h, j]
                if metric == "euclidean":
                    out[h, i, j] = -np.sqrt(np.sum((x - y) ** 2) + 1e-8)
                elif metric == "squared_euclidean":
                    out[h, i, j] = -np.sum((x - y) ** 2)
                elif metric == "manhattan":
                    out[h, i, j] = -np.sum(np.abs(x - y))
                elif metric == "cosine_similarity":
                    nx, ny = np.linalg.norm(x), np.linalg.norm(y)
                    nx = nx if nx != 0 else 1e-8
                    ny = ny if ny != 0 else 1e-8
                    out[h, i, j] = np.clip(x @ y / (nx * ny), -1, 1)
                elif metric == "cosine_distance":
                    nx, ny = np.linalg.norm(x), np.linalg.norm(y)
                    nx = nx if nx != 0 else 1e-8
                    ny = ny if ny != 0 else 1e-8
                    out[h, i, j] = -(1 - np.clip(x @ y / (nx * ny), -1, 1))
                elif metric == "dot_product":
                    out[h, i, j] = x @ y
                elif metric == "scaled_dot_product":
                    out[h, i, j] = x @ y / np.sqrt(DH)
                elif metric == "gaussian_kernel":
                    out[h, i, j] = np.exp(-np.sum((x - y) ** 2) / 2.0)
                elif metric == "rbf_kernel":
                    out[h, i, j] = np.exp(-np.sum((x - y) ** 2))
                elif metric == "mahalanobis":
                    out[h, i, j] = -np.sqrt(np.sum((x - y) ** 2) + 1e-8)
    return out


@pytest.mark.parametrize("metric", D.ALL_METRICS)
def test_pairwise_scores_vs_oracle(metric, qk):
    q, k = qk
    got = D.pairwise_scores(metric, q, k)
    want = dense_oracle(metric, q, k)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("metric", D.ALL_METRICS)
def test_edgewise_matches_dense_gather(metric, qk, rng):
    q, k = qk
    eq = jnp.asarray(rng.integers(0, N, 25), jnp.int32)
    ek = jnp.asarray(rng.integers(0, N, 25), jnp.int32)
    dense = D.pairwise_scores(metric, q, k)
    got = D.edgewise_scores(metric, jnp.take(q, eq, axis=1),
                            jnp.take(k, ek, axis=1))
    want = dense[:, eq, ek]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_masked_softmax_matches_dense_and_handles_dead_rows(rng):
    s = jnp.asarray(rng.standard_normal((4, 6, 6)), jnp.float32)
    m = jnp.asarray(rng.random((4, 6, 6)) > 0.4)
    m = m.at[0, 2].set(False)   # dead row
    got = masked_softmax(s, m)
    # valid rows: matches where+softmax
    ref = jax.nn.softmax(jnp.where(m, s, -jnp.inf), axis=-1)
    live = np.asarray(jnp.any(m, axis=-1))
    np.testing.assert_allclose(np.asarray(got)[live],
                               np.asarray(ref)[live], rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(got)[~live] == 0)


def test_sparse_attention_matches_dense(rng):
    """SDDMM -> segment softmax -> SpMM == dense masked attention."""
    q = jnp.asarray(rng.standard_normal((HEADS, N, DH)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((HEADS, N, DH)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((HEADS, N, DH)), jnp.float32)
    adj = rng.random((N, N)) > 0.5
    np.fill_diagonal(adj, True)
    eq_np, ek_np = np.nonzero(adj)
    E = len(eq_np)
    pad = 8  # padded edges
    eq = jnp.asarray(np.concatenate([eq_np, np.zeros(pad)]), jnp.int32)
    ek = jnp.asarray(np.concatenate([ek_np, np.zeros(pad)]), jnp.int32)
    em = jnp.asarray(np.concatenate([np.ones(E), np.zeros(pad)]) > 0)

    for metric in ["scaled_dot_product", "euclidean", "cosine_similarity"]:
        got = S.edge_attention(metric, q, k, v, eq, ek, em, N)
        scores = D.pairwise_scores(metric, q, k)
        w = masked_softmax(scores, jnp.asarray(adj)[None])
        want = jnp.einsum("hij,hjd->hid", w, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_segment_softmax_normalizes(rng):
    scores = jnp.asarray(rng.standard_normal((2, 12)), jnp.float32)
    eq = jnp.asarray([0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 0, 0], jnp.int32)
    em = jnp.asarray([True] * 10 + [False, False])
    w = S.segment_softmax(scores, eq, em, 5)
    sums = jax.ops.segment_sum(np.asarray(w).T, eq, num_segments=5)
    # every segment with valid edges sums to 1
    np.testing.assert_allclose(sums[:4], 1.0, rtol=1e-5)
    assert np.all(np.asarray(w)[:, ~np.asarray(em)] == 0)


def test_masked_mean_max(rng):
    x = jnp.asarray(rng.standard_normal((3, 5, 4)), jnp.float32)
    m = jnp.asarray([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1], [0, 1, 0, 1, 0]],
                    dtype=bool)
    got = masked_mean(x, m, axis=1)
    for b in range(3):
        want = np.asarray(x)[b][np.asarray(m)[b]].mean(axis=0)
        np.testing.assert_allclose(np.asarray(got)[b], want, rtol=1e-5,
                                   atol=1e-6)
    gmax = masked_max(x, m, axis=1)
    for b in range(3):
        want = np.asarray(x)[b][np.asarray(m)[b]].max(axis=0)
        np.testing.assert_allclose(np.asarray(gmax)[b], want, rtol=1e-5)


def test_coo_to_csr_roundtrip(rng):
    from tagan_tpu.core.graph import coo_to_csr
    T, E, Nn = 3, 20, 8
    eq = jnp.asarray(rng.integers(0, Nn, (T, E)), jnp.int32)
    ek = jnp.asarray(rng.integers(0, Nn, (T, E)), jnp.int32)
    em = jnp.asarray(rng.random((T, E)) > 0.3)
    csr = coo_to_csr(eq, ek, em, Nn)
    for t in range(T):
        rp = np.asarray(csr.row_ptr[t])
        col = np.asarray(csr.col[t])
        mask = np.asarray(csr.edge_mask[t])
        # row_ptr counts valid edges per query node
        for i in range(Nn):
            want = int(np.sum(np.asarray(em[t]) & (np.asarray(eq[t]) == i)))
            assert rp[i + 1] - rp[i] == want
        # sorted segment contains the right neighbors
        for i in range(Nn):
            seg = col[rp[i]:rp[i + 1]]
            want = np.sort(np.asarray(ek[t])[np.asarray(em[t])
                                             & (np.asarray(eq[t]) == i)])
            assert np.array_equal(np.sort(seg), want)
        assert mask[:rp[Nn]].all()

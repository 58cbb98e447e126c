"""Op-library tests: dense reference parity + gradient checks.

Strategy per SURVEY.md §4: every sparse/custom op is validated against a
dense numpy/jnp reference of the same math, and custom VJPs against
numerical finite differences or jax's own autodiff of the dense form.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgnn_tpu.ops.aggregate import (
    aggregate_edges_to_dst,
    edge_softmax,
    gather_aggregate,
    scatter_src_to_edges,
)
from sgnn_tpu.ops.segment import segment_softmax_coo, spmm_coo


def _rand_block(rng, D=16, K=5, S=24, F=8):
    nbr = rng.integers(0, S, size=(D, K)).astype(np.int32)
    w = rng.random((D, K)).astype(np.float32)
    w[rng.random((D, K)) < 0.3] = 0.0  # padded slots
    x = rng.standard_normal((S, F)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(w)


def _dense_adj(nbr, w, S):
    """Dense [D, S] matrix equivalent of the (nbr, w) block."""
    D, K = nbr.shape
    A = np.zeros((D, S), np.float32)
    for d in range(D):
        for k in range(K):
            A[d, nbr[d, k]] += w[d, k]
    return A


def test_gather_aggregate_matches_dense():
    rng = np.random.default_rng(0)
    x, nbr, w = _rand_block(rng)
    out = gather_aggregate(x, nbr, w)
    A = _dense_adj(np.asarray(nbr), np.asarray(w), x.shape[0])
    np.testing.assert_allclose(np.asarray(out), A @ np.asarray(x), rtol=1e-5)


def test_gather_aggregate_grad_x():
    rng = np.random.default_rng(1)
    x, nbr, w = _rand_block(rng)
    A = jnp.asarray(_dense_adj(np.asarray(nbr), np.asarray(w), x.shape[0]))

    f_sparse = lambda xx: jnp.sum(jnp.sin(gather_aggregate(xx, nbr, w)))
    f_dense = lambda xx: jnp.sum(jnp.sin(A @ xx))
    g_sparse = jax.grad(f_sparse)(x)
    g_dense = jax.grad(f_dense)(x)
    np.testing.assert_allclose(np.asarray(g_sparse), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-5)


def test_gather_aggregate_grad_w():
    rng = np.random.default_rng(2)
    x, nbr, w = _rand_block(rng, D=6, K=3, S=10, F=4)

    f = lambda ww: jnp.sum(gather_aggregate(x, nbr, ww) ** 2)
    g = jax.grad(f)(w)
    # finite differences
    eps = 1e-3
    w_np = np.asarray(w)
    for d, k in [(0, 0), (3, 2), (5, 1)]:
        wp, wm = w_np.copy(), w_np.copy()
        wp[d, k] += eps
        wm[d, k] -= eps
        num = (f(jnp.asarray(wp)) - f(jnp.asarray(wm))) / (2 * eps)
        assert np.isclose(np.asarray(g)[d, k], num, rtol=1e-2, atol=1e-2)


def test_edge_softmax_masked():
    rng = np.random.default_rng(3)
    scores = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
    mask = jnp.asarray(rng.random((8, 5)) > 0.4)
    att = edge_softmax(scores, mask)
    a = np.asarray(att)
    m = np.asarray(mask)
    # rows with any valid edge sum to 1; invalid slots are exactly 0
    sums = a.sum(axis=1)
    for d in range(8):
        if m[d].any():
            assert np.isclose(sums[d], 1.0, rtol=1e-5)
        assert (a[d][~m[d]] == 0).all()


def test_edge_softmax_grad_finite():
    scores = jnp.asarray(np.random.default_rng(4).standard_normal((4, 3)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 0], [1, 0, 0], [1, 1, 1], [0, 0, 0]], bool))
    g = jax.grad(lambda s: jnp.sum(edge_softmax(s, mask) ** 2))(scores)
    assert np.isfinite(np.asarray(g)).all()
    # fully-masked row gets zero gradient
    assert (np.asarray(g)[3] == 0).all()


def test_spmm_coo_matches_dense():
    rng = np.random.default_rng(5)
    S, D, E, F = 20, 12, 60, 7
    src = jnp.asarray(rng.integers(0, S, E).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, D, E).astype(np.int32))
    w = jnp.asarray(rng.random(E).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((S, F)).astype(np.float32))
    out = spmm_coo(x, src, dst, w, D)
    A = np.zeros((D, S), np.float32)
    for e in range(E):
        A[dst[e], src[e]] += w[e]
    np.testing.assert_allclose(np.asarray(out), A @ np.asarray(x), rtol=1e-4,
                               atol=1e-5)
    # VJP parity with dense
    gd = jax.grad(lambda xx: jnp.sum(spmm_coo(xx, src, dst, w, D) ** 2))(x)
    gdd = jax.grad(lambda xx: jnp.sum((jnp.asarray(A) @ xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gdd), rtol=1e-4,
                               atol=1e-5)


def test_segment_softmax_coo():
    rng = np.random.default_rng(6)
    E, D = 30, 6
    dst = jnp.asarray(rng.integers(0, D, E).astype(np.int32))
    scores = jnp.asarray(rng.standard_normal(E).astype(np.float32))
    valid = jnp.asarray(rng.random(E) > 0.2)
    att = segment_softmax_coo(scores, dst, valid, D)
    a, d_np, v_np = np.asarray(att), np.asarray(dst), np.asarray(valid)
    for seg in range(D):
        sel = (d_np == seg) & v_np
        if sel.any():
            assert np.isclose(a[sel].sum(), 1.0, rtol=1e-5)
    assert (a[~v_np] == 0).all()


def test_scatter_and_aggregate_consistency():
    """gather_aggregate == scatter→(weight·msg)→aggregate chaining."""
    rng = np.random.default_rng(7)
    x, nbr, w = _rand_block(rng)
    direct = gather_aggregate(x, nbr, w)
    msgs = scatter_src_to_edges(x, nbr)
    chained = aggregate_edges_to_dst(msgs, w)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(chained),
                               rtol=1e-5)


def test_gather_min_max():
    from sgnn_tpu.ops.reductions import gather_max, gather_min

    rng = np.random.default_rng(8)
    x, nbr, w = _rand_block(rng, D=10, K=4, S=15, F=6)
    mask = w != 0
    mx = gather_max(x, nbr, mask)
    mn = gather_min(x, nbr, mask)
    xm, nm, mm = np.asarray(x), np.asarray(nbr), np.asarray(mask)
    for d in range(10):
        ks = np.nonzero(mm[d])[0]
        if ks.size == 0:
            assert (np.asarray(mx)[d] == 0).all()
            continue
        rows = xm[nm[d, ks]]
        np.testing.assert_allclose(np.asarray(mx)[d], rows.max(0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mn)[d], rows.min(0), rtol=1e-6)


def test_gather_max_grad_routes_to_argmax():
    from sgnn_tpu.ops.reductions import gather_max

    x = jnp.asarray([[1.0], [5.0], [3.0]])
    nbr = jnp.asarray([[0, 1, 2]])
    mask = jnp.ones((1, 3), bool)
    g = jax.grad(lambda xx: gather_max(xx, nbr, mask).sum())(x)
    np.testing.assert_allclose(np.asarray(g).ravel(), [0.0, 1.0, 0.0])


def test_segment_min_max_coo():
    from sgnn_tpu.ops.reductions import segment_max_coo, segment_min_coo

    x = jnp.asarray([[1.0], [4.0], [-2.0]])
    src = jnp.asarray([0, 1, 2, 1], dtype=jnp.int32)
    dst = jnp.asarray([0, 0, 1, 1], dtype=jnp.int32)
    valid = jnp.asarray([True, True, True, False])
    mx = segment_max_coo(x, src, dst, valid, 2)
    mn = segment_min_coo(x, src, dst, valid, 2)
    np.testing.assert_allclose(np.asarray(mx).ravel(), [4.0, -2.0])
    np.testing.assert_allclose(np.asarray(mn).ravel(), [1.0, -2.0])


def test_remat_same_results():
    """jax.checkpoint path (SubLinearMemCostNNOP analog) is numerically
    identical to the stored-activation path."""
    from sgnn_tpu.models.gnn import init_model, model_forward
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.sampler.host import HostSampler
    from sgnn_tpu.train.trainer import host_batch_to_device
    from sgnn_tpu.data.synthetic import random_graph_dataset

    ds = random_graph_dataset(200, 6, 16, 4, seed=11)
    adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
    s = HostSampler(adj, [3, 2], 32, seed=0, use_native=False)
    hb = s.sample(np.arange(32, dtype=np.int32))
    x0, y, yv = hb.payload(ds.features, ds.labels)
    batch = host_batch_to_device(hb, x0, y, yv)
    params = init_model(jax.random.PRNGKey(0), "gcn", [16, 8, 4])

    def loss(p, remat):
        logp = model_forward(p, "gcn", batch, remat=remat)
        from sgnn_tpu.nn.functional import nll_loss_masked

        return nll_loss_masked(logp, batch.labels, batch.label_valid)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(g0.weights, g1.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_pallas_gather_aggregate_interpret():
    """Pallas fused kernel == XLA path (interpret mode; TPU-validated in
    docs/PERF.md with max diff 1.9e-6 at production shapes)."""
    from sgnn_tpu.ops.pallas.gather_agg import (
        pallas_gather_aggregate_fwd_impl,
    )

    rng = np.random.default_rng(12)
    D, K, S, F = 32, 5, 64, 128
    nbr = jnp.asarray(rng.integers(0, S, (D, K)).astype(np.int32))
    w = jnp.asarray(rng.random((D, K)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((S, F)).astype(np.float32))
    out_p = pallas_gather_aggregate_fwd_impl(x, nbr, w, interpret=True)
    out_x = gather_aggregate(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_spmm_coo_chunked_matches_direct(monkeypatch):
    """Edge-chunked SpMM (lax.scan over edge chunks, bounding the [E, F]
    message temps that OOM whole-graph backward at ~24M edges) is exact:
    forward, d_x, and d_weight all match the direct path."""
    import sgnn_tpu.ops.segment as seg

    rng = np.random.default_rng(0)
    S, E, F, D = 50, 333, 16, 40  # E deliberately NOT a chunk multiple
    x = jnp.asarray(rng.normal(size=(S, F)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, S, E).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, D, E).astype(np.int32))
    w = jnp.asarray(rng.normal(size=E).astype(np.float32))

    def loss(x_, w_):
        out = seg.spmm_coo(x_, src, dst, w_, D)
        return jnp.sum(out * out), out

    (l0, out0), (dx0, dw0) = jax.value_and_grad(loss, argnums=(0, 1),
                                                has_aux=True)(x, w)
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 64 * F)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 64)  # force 64-edge chunks
    (l1, out1), (dx1, dw1) = jax.value_and_grad(loss, argnums=(0, 1),
                                                has_aux=True)(x, w)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw0),
                               rtol=1e-5, atol=1e-5)
    assert abs(float(l1) - float(l0)) < 1e-3


def test_spmm_coo_multihead_chunked_matches_direct(monkeypatch):
    """Multi-head edge-chunked SpMM: forward and attention grads (through
    scan autodiff) match the direct path."""
    import sgnn_tpu.ops.segment as seg

    rng = np.random.default_rng(1)
    S, E, H, FH, D = 40, 257, 4, 8, 30
    x = jnp.asarray(rng.normal(size=(S, H * FH)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, S, E).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, D, E).astype(np.int32))
    att = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))

    def loss(x_, a_):
        out = seg.spmm_coo_multihead(x_, src, dst, a_, D)
        return jnp.sum(out * out)

    g0 = jax.grad(loss, argnums=(0, 1))(x, att)
    o0 = seg.spmm_coo_multihead(x, src, dst, att, D)
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 32 * H * FH)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 32)  # genuinely multi-chunk
    g1 = jax.grad(loss, argnums=(0, 1))(x, att)
    o1 = seg.spmm_coo_multihead(x, src, dst, att, D)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunked", [False, True])
def test_spmm_coo_csc_matches_unsorted(monkeypatch, chunked):
    """Double-sorted SpMM (spmm_coo_csc): forward, d_x and d_weight equal
    spmm_coo on the same edges, direct and edge-chunked."""
    import sgnn_tpu.ops.segment as seg

    rng = np.random.default_rng(7)
    S, F, D = 37, 16, 29
    deg = rng.integers(0, 9, D)
    dst = np.repeat(np.arange(D, dtype=np.int32), deg)  # CSC: ascending dst
    E = dst.size
    src = rng.integers(0, S, E).astype(np.int32)
    w = rng.normal(size=E).astype(np.float32)
    pad = 13                                            # weight-0 tail
    dst = np.concatenate([dst, np.full(pad, D - 1, np.int32)])
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    w = np.concatenate([w, np.zeros(pad, np.float32)])
    perm = np.argsort(src, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    x = jnp.asarray(rng.normal(size=(S, F)).astype(np.float32))
    src, dst, w = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
    permj, invj = jnp.asarray(perm), jnp.asarray(inv)

    if chunked:
        monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
        monkeypatch.setattr(seg, "_CHUNK_ELEMS", 64 * F)
        monkeypatch.setattr(seg, "_CHUNK_FLOOR", 64)  # 64-edge chunks

    def loss_ref(x_, w_):
        out = seg.spmm_coo(x_, src, dst, w_, D)
        return jnp.sum(out * jnp.cos(out)), out

    def loss_csc(x_, w_):
        out = seg.spmm_coo_csc(x_, src, dst, w_, permj, invj, D)
        return jnp.sum(out * jnp.cos(out)), out

    (l0, o0), (dx0, dw0) = jax.value_and_grad(
        loss_ref, argnums=(0, 1), has_aux=True)(x, w)
    (l1, o1), (dx1, dw1) = jax.value_and_grad(
        loss_csc, argnums=(0, 1), has_aux=True)(x, w)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw0),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunked", [False, True])
def test_spmm_coo_multihead_csc_matches_unsorted(monkeypatch, chunked):
    """Double-sorted multihead SpMM: forward, d_x and d_att equal the
    autodiffed spmm_coo_multihead on the same edges."""
    import sgnn_tpu.ops.segment as seg

    rng = np.random.default_rng(11)
    S, H, FH, D = 33, 4, 8, 21
    deg = rng.integers(0, 7, D)
    dst = np.repeat(np.arange(D, dtype=np.int32), deg)
    E = dst.size
    src = rng.integers(0, S, E).astype(np.int32)
    att = rng.normal(size=(E, H)).astype(np.float32)
    pad = 9
    dst = np.concatenate([dst, np.full(pad, D - 1, np.int32)])
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    att = np.concatenate([att, np.zeros((pad, H), np.float32)])
    perm = np.argsort(src, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    x = jnp.asarray(rng.normal(size=(S, H * FH)).astype(np.float32))
    src, dst, att = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(att)
    permj, invj = jnp.asarray(perm), jnp.asarray(inv)

    if chunked:
        monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
        monkeypatch.setattr(seg, "_CHUNK_ELEMS", 16 * H * FH)
        monkeypatch.setattr(seg, "_CHUNK_FLOOR", 16)  # genuinely multi-chunk

    def loss_ref(x_, a_):
        out = seg.spmm_coo_multihead(x_, src, dst, a_, D)
        return jnp.sum(out * jnp.sin(out))

    def loss_csc(x_, a_):
        out = seg.spmm_coo_multihead_csc(x_, src, dst, a_, permj, invj, D)
        return jnp.sum(out * jnp.sin(out))

    g0 = jax.grad(loss_ref, argnums=(0, 1))(x, att)
    g1 = jax.grad(loss_csc, argnums=(0, 1))(x, att)
    o0 = seg.spmm_coo_multihead(x, src, dst, att, D)
    o1 = seg.spmm_coo_multihead_csc(x, src, dst, att, permj, invj, D)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_multihead_chunks_before_single_head(monkeypatch):
    """Multi-head paths hand _edge_chunk live_factor=3 (their direct path
    keeps ~3 [E, H, Fh] temps alive vs 1-2 for single-head), so they must
    fall off the direct path at a 3x smaller E*F — the measured 4-head
    whole-graph serving OOM at 1.5G elements on a 17 GB chip."""
    from sgnn_tpu.ops import segment as seg

    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 200_000)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 10_000)
    # budgets count TILE-PADDED elements (feat 10 -> 128 lanes):
    # 128k effective elements: direct for single-head, chunked at x3
    assert seg._edge_chunk(1000, 10) is None
    assert seg._edge_chunk(1000, 10, live_factor=3) is not None
    # the multihead entry points themselves take the early chunk path
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, 50, 1000).astype(np.int32))
    dst = jnp.asarray(np.sort(rng.integers(0, 30, 1000)).astype(np.int32))
    att = jnp.asarray(rng.standard_normal((1000, 2)).astype(np.float32))
    got = seg.spmm_coo_multihead(x, src, dst, att, 30,
                                 indices_are_sorted=True)
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 1 << 40)  # force direct
    ref = seg.spmm_coo_multihead(x, src, dst, att, 30,
                                 indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunked", [False, True])
def test_head_major_ops_match_edge_major(monkeypatch, chunked):
    """segment_softmax_hm / spmm_coo_multihead_hm ([H, E] head-major — the
    layout that avoids the 32x minor-dim tile padding of [E, H] edge
    tensors) match the edge-major ops numerically, values and grads, in
    both the direct and the chunked regimes."""
    from sgnn_tpu.ops import segment as seg

    if chunked:
        monkeypatch.setattr(seg, "_DIRECT_ELEMS", 1)
        monkeypatch.setattr(seg, "_CHUNK_ELEMS", 1)
        monkeypatch.setattr(seg, "_CHUNK_FLOOR", 64)
    rng = np.random.default_rng(3)
    S, E, V, H, FH = 40, 300, 25, 4, 8
    x = jnp.asarray(rng.standard_normal((S, H * FH)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, S, E).astype(np.int32))
    dst = jnp.asarray(np.sort(rng.integers(0, V, E)).astype(np.int32))
    score = rng.standard_normal((E, H)).astype(np.float32)
    valid = jnp.asarray(rng.random(E) > 0.1)

    att_em = seg.segment_softmax_coo(jnp.asarray(score), dst, valid, V,
                                     indices_are_sorted=True)
    att_hm = seg.segment_softmax_hm(jnp.asarray(score.T), dst, valid, V,
                                    indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(att_hm), np.asarray(att_em).T,
                               rtol=1e-5, atol=1e-6)

    out_em = seg.spmm_coo_multihead(x, src, dst, att_em, V,
                                    indices_are_sorted=True)
    out_hm = seg.spmm_coo_multihead_hm(x, src, dst, att_hm, V,
                                       indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out_hm), np.asarray(out_em),
                               rtol=1e-4, atol=1e-5)

    # gradients: dx and d_att agree with the edge-major op's autodiff
    def f_em(x_, a_):
        return seg.spmm_coo_multihead(x_, src, dst, a_, V,
                                      indices_are_sorted=True).sum()

    def f_hm(x_, a_):
        return seg.spmm_coo_multihead_hm(x_, src, dst, a_, V,
                                         indices_are_sorted=True).sum()

    gx_em, ga_em = jax.grad(f_em, argnums=(0, 1))(x, att_em)
    gx_hm, ga_hm = jax.grad(f_hm, argnums=(0, 1))(x, att_hm)
    np.testing.assert_allclose(np.asarray(gx_hm), np.asarray(gx_em),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_hm), np.asarray(ga_em).T,
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Destination-range windowed chunking (SpmmPlan / SpmmPlanner): the chunked
# scans must accumulate into bounded dst/src row windows and still match the
# direct path bit-for-tolerance — forward, d_x, d_weight/d_att.
# ---------------------------------------------------------------------------


def _sorted_coo(seed=3, S=41, F=16, D=33, pad=17, heads=1):
    """Random CSC-ordered COO with a weight-0 padding tail (build_coo shape)."""
    rng = np.random.default_rng(seed)
    deg = rng.integers(0, 9, D)
    dst = np.repeat(np.arange(D, dtype=np.int32), deg)
    E = dst.size
    src = rng.integers(0, S, E).astype(np.int32)
    if heads > 1:
        w = rng.normal(size=(E, heads)).astype(np.float32)
        w_pad = np.zeros((pad, heads), np.float32)
    else:
        w = rng.normal(size=E).astype(np.float32)
        w_pad = np.zeros(pad, np.float32)
    dst = np.concatenate([dst, np.full(pad, D - 1, np.int32)])
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    w = np.concatenate([w, w_pad])
    perm = np.argsort(src, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    x = rng.normal(size=(S, F)).astype(np.float32)
    return x, src, dst, w, perm, inv, E


def test_spmm_planner_spans(monkeypatch):
    """Planner windows bound every chunk's real dst/src span (with the +8
    alignment slack) and clamp at the segment count."""
    import sgnn_tpu.ops.segment as seg

    _, src, dst, _, perm, _, e_real = _sorted_coo(seed=5, S=50, D=40)
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 32 * 16)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 32)
    pl = seg.SpmmPlanner(dst, src[perm], num_src=50, num_dst=40,
                         e_real=e_real)
    p = pl.plan(16)
    assert p is not None and p.chunk == 32
    assert p.dst_span % 8 == 0 and 0 < p.dst_span <= 40
    assert p.src_span % 8 == 0 and 0 < p.src_span <= 50
    for k in range(0, e_real, p.chunk):
        d = dst[k:min(k + p.chunk, e_real)]
        assert int(d[-1]) - (int(d[0]) // 8) * 8 < p.dst_span
    sp = src[perm]
    for k in range(0, sp.size, p.chunk):
        s = sp[k:k + p.chunk]
        assert int(s[-1]) - (int(s[0]) // 8) * 8 < p.src_span
    # direct-path regime: no plan
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 1 << 40)
    pl2 = seg.SpmmPlanner(dst, src[perm], num_src=50, num_dst=40,
                          e_real=e_real)
    assert pl2.plan(16) is None


def test_spmm_csc_windowed_matches_direct(monkeypatch):
    """spmm_coo_csc with an SpmmPlan == the direct path (fwd, dx, dw)."""
    import sgnn_tpu.ops.segment as seg

    x, src, dst, w, perm, inv, e_real = _sorted_coo()
    xj = jnp.asarray(x)
    srcj, dstj, wj = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
    pj, ij = jnp.asarray(perm), jnp.asarray(inv)
    D = 33

    def loss(x_, w_, plan):
        out = seg.spmm_coo_csc(x_, srcj, dstj, w_, pj, ij, D, plan)
        return jnp.sum(out * jnp.cos(out)), out

    (l0, o0), (dx0, dw0) = jax.value_and_grad(
        functools.partial(loss, plan=None), argnums=(0, 1), has_aux=True
    )(xj, wj)
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 32 * 16)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 32)
    planner = seg.SpmmPlanner(dst, src[perm], num_src=41, num_dst=D,
                              e_real=e_real)
    plan = planner.plan(16)
    assert plan is not None and plan.dst_span < D  # genuinely windowed
    (l1, o1), (dx1, dw1) = jax.value_and_grad(
        functools.partial(loss, plan=plan), argnums=(0, 1), has_aux=True
    )(xj, wj)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw0),
                               rtol=1e-5, atol=1e-5)
    # forward-only sorted entry point takes the same plan
    o2 = seg.spmm_coo_fwd_sorted(xj, srcj, dstj, wj, D, plan)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o0),
                               rtol=1e-5, atol=1e-5)


def test_spmm_multihead_csc_windowed_matches_direct(monkeypatch):
    import sgnn_tpu.ops.segment as seg

    H, F = 2, 16
    x, src, dst, att, perm, inv, e_real = _sorted_coo(F=F, heads=H)
    xj, attj = jnp.asarray(x), jnp.asarray(att)
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    pj, ij = jnp.asarray(perm), jnp.asarray(inv)
    D = 33

    def loss(x_, a_, plan):
        out = seg.spmm_coo_multihead_csc(x_, srcj, dstj, a_, pj, ij, D, plan)
        return jnp.sum(out * jnp.cos(out))

    l0, (dx0, da0) = jax.value_and_grad(
        functools.partial(loss, plan=None), argnums=(0, 1))(xj, attj)
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 32 * F)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 32)
    planner = seg.SpmmPlanner(dst, src[perm], num_src=41, num_dst=D,
                              e_real=e_real)
    plan = planner.plan(F, live_factor=3)
    assert plan is not None
    l1, (dx1, da1) = jax.value_and_grad(
        functools.partial(loss, plan=plan), argnums=(0, 1))(xj, attj)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da1), np.asarray(da0),
                               rtol=1e-5, atol=1e-5)


def test_spmm_hm_windowed_matches_direct(monkeypatch):
    """Head-major op with plan + CSR perm: fwd dst windows, bwd src windows."""
    import sgnn_tpu.ops.segment as seg

    H, F = 2, 16
    x, src, dst, att, perm, inv, e_real = _sorted_coo(F=F, heads=H)
    att_hm = np.ascontiguousarray(att.T)
    xj, aj = jnp.asarray(x), jnp.asarray(att_hm)
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    pj, ij = jnp.asarray(perm), jnp.asarray(inv)
    D = 33

    def loss(x_, a_, plan, use_perm):
        out = seg.spmm_coo_multihead_hm(
            x_, srcj, dstj, a_, D, True, plan,
            perm=pj if use_perm else None,
            inv_perm=ij if use_perm else None)
        return jnp.sum(out * jnp.cos(out))

    l0, (dx0, da0) = jax.value_and_grad(
        functools.partial(loss, plan=None, use_perm=False),
        argnums=(0, 1))(xj, aj)
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 32 * F)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 32)
    planner = seg.SpmmPlanner(dst, src[perm], num_src=41, num_dst=D,
                              e_real=e_real)
    plan = planner.plan_hm(F // H)
    assert plan is not None
    for use_perm in (False, True):
        l1, (dx1, da1) = jax.value_and_grad(
            functools.partial(loss, plan=plan, use_perm=use_perm),
            argnums=(0, 1))(xj, aj)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(da1), np.asarray(da0),
                                   rtol=1e-5, atol=1e-5)


def test_segment_extreme_windowed_matches_direct(monkeypatch):
    """Windowed min/max == direct (fwd + subgradient routing)."""
    import sgnn_tpu.ops.segment as seg
    from sgnn_tpu.ops.reductions import segment_max_coo, segment_min_coo

    x, src, dst, w, perm, _, e_real = _sorted_coo(seed=11)
    valid = jnp.asarray(w != 0)
    xj = jnp.asarray(x)
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    D = 33
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 32 * 16)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 32)
    planner = seg.SpmmPlanner(dst, src[perm], num_src=41, num_dst=D,
                              e_real=e_real)
    plan = planner.plan(16)
    for red in (segment_min_coo, segment_max_coo):
        def f(x_, plan):
            out = red(x_, srcj, dstj, valid, D, indices_are_sorted=True,
                      plan=plan)
            return jnp.sum(out * jnp.cos(out)), out

        (l0, o0), dx0 = jax.value_and_grad(
            functools.partial(f, plan=None), has_aux=True)(xj)
        (l1, o1), dx1 = jax.value_and_grad(
            functools.partial(f, plan=plan), has_aux=True)(xj)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                                   rtol=1e-5, atol=1e-5)


def test_gather_rows_hm_matches_per_head():
    """gather_rows_hm == per-head scalar gathers (chunked + direct)."""
    import numpy as np

    from sgnn_tpu.ops.segment import SpmmPlan, gather_rows_hm

    rng = np.random.default_rng(0)
    v, e, h = 500, 3000, 4
    table = jnp.asarray(rng.standard_normal((v, h)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, v, e).astype(np.int32))
    ref = np.stack([np.asarray(table)[:, i][np.asarray(idx)]
                    for i in range(h)])
    np.testing.assert_allclose(
        np.asarray(gather_rows_hm(table, idx)), ref, rtol=1e-6)
    plan = SpmmPlan(chunk=512, dst_span=8, src_span=8)
    np.testing.assert_allclose(
        np.asarray(gather_rows_hm(table, idx, plan)), ref, rtol=1e-6)
    # gradient: d/dtable sum(out * c) scatters c back per head
    c = rng.standard_normal((h, e)).astype(np.float32)
    g = jax.grad(lambda t: jnp.sum(gather_rows_hm(t, idx, plan)
                                   * jnp.asarray(c)))(table)
    refg = np.zeros((v, h), np.float32)
    for i in range(h):
        np.add.at(refg[:, i], np.asarray(idx), c[i])
    # f32 scatter-add summation order differs from np.add.at
    np.testing.assert_allclose(np.asarray(g), refg, rtol=1e-4, atol=1e-5)

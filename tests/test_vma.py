"""shard_map varying-manual-axes (vma) typing under STRICT JAX checks.

Round-4 driver regression (VERDICT r4 Missing #1): with stock JAX's
custom-VJP cotangent typecheck on (tests/conftest.py forces it), a
REPLICATED array flowing into a differentiated custom-VJP operand inside
shard_map raises "the varying manual axes do not match" — locally invisible
because the TPU-tunnel sitecustomize disables the check.  The trigger was
the device sampler's identity-srcs bottom hop handing the replicated
feature matrix straight to gather_aggregate; these tests pin the fix
(utils/vma.py lifts) at the op, engine and DP-composition level.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P


def _mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return Mesh(np.asarray(devs[:8]).reshape(8), ("data",))


def test_strict_bwd_checks_enabled():
    """The suite must run with the stock-JAX custom-VJP typecheck ON
    (driver parity) — if this fails, every other vma test is vacuous."""
    from jax._src import config as _cfg

    assert _cfg.disable_bwd_checks.value is False


def test_match_vma_helpers():
    from sgnn_tpu.utils.vma import match_cotangent_vma, match_vma

    mesh = _mesh8()
    # outside shard_map: pure no-ops
    a, b = jnp.ones((8, 4)), jnp.ones((8, 4))
    assert match_vma(a, b) is a
    assert match_cotangent_vma(a, b) is a
    assert match_cotangent_vma(None, b) is None

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(), P("data")), out_specs=P("data"))
    def f(rep, var):
        lifted = match_vma(rep, var)
        # lifted must now be varying over "data" so the product types check
        return lifted * var

    out = f(jnp.full((1,), 2.0), jnp.arange(8, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.arange(8.0))


def test_gather_aggregate_replicated_source_grad_under_shard_map():
    """gather_aggregate with x_src derived from a REPLICATED table (the
    identity-srcs x0 shape) inside shard_map + value_and_grad: per-device
    partial grads for replicated params, explicit psum — the framework's
    AllReduce convention.  Fails on r04 code under strict checks."""
    from sgnn_tpu.ops.aggregate import gather_aggregate
    from sgnn_tpu.utils.vma import match_vma, psum_grads

    mesh = _mesh8()
    V, F, H, D, K = 24, 8, 4, 16, 3
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((V, F)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((F, H)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, V, (8, D, K)), jnp.int32)
    wgt = jnp.asarray(rng.random((8, D, K)), jnp.float32)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")), out_specs=(P(), P()))
    def step(feats, w, nbr, wgt):
        nbr, wgt = nbr[0], wgt[0]

        def loss_fn(w):
            # identity bottom hop: x0 IS the replicated feature matrix —
            # lift it to the batch's vma exactly as device_sample_batch does
            x0 = match_vma(feats, nbr)
            xw = jnp.dot(x0, w)
            y = gather_aggregate(xw, nbr, wgt)
            return jnp.sum(y * y)

        loss, g = jax.value_and_grad(loss_fn)(w)
        # version-adaptive AllReduce: under vma-typed JAX `g` is already
        # the cross-device total (a raw psum would scale it by n_dev)
        return jax.lax.pmean(loss, "data"), psum_grads(g, "data", loss)

    loss, g = step(feats, w, nbr, wgt)
    assert np.isfinite(float(loss))
    # the psummed grad equals the sum of per-device closed-form grads
    expect = np.zeros(w.shape, np.float32)
    for d in range(8):
        def f(wv):
            xw = feats @ wv
            y = jnp.stack([
                sum(xw[nbr[d, i, k]] * wgt[d, i, k] for k in range(K))
                for i in range(D)
            ])
            return jnp.sum(y * y)

        expect += np.asarray(jax.grad(f)(w))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=5e-3, atol=1e-3)


def test_device_sampler_identity_bottom_hop_dp_grad(tiny_ds):
    """The r4 driver-dryrun failure shape end-to-end: device_sample_batch
    with a whole-vertex bottom pad (identity srcs ⇒ x0 = the replicated
    feature matrix) inside a shard_map DP step, differentiated.  Fails on
    r04 code under strict checks with 'varying manual axes do not match'."""
    from sgnn_tpu.models.gnn import init_model, model_forward
    from sgnn_tpu.nn.functional import nll_loss_masked
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.sampler.blocks import WeightKind
    from sgnn_tpu.sampler.device import device_sample_batch

    mesh = _mesh8()
    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    V = tiny_ds.num_vertices
    indptr = jnp.asarray(adj.indptr.astype(np.int32))
    indices = jnp.asarray(adj.indices.astype(np.int32))
    in_deg = jnp.asarray(adj.in_degree.astype(np.int32))
    out_deg = jnp.asarray(adj.out_degree.astype(np.int32))
    feats = jnp.asarray(tiny_ds.features)
    labels = jnp.asarray(tiny_ds.labels.astype(np.int32))
    F = tiny_ds.features.shape[1]
    params = init_model(jax.random.PRNGKey(0), "gcn", [F, 16, 5])
    B = 16
    seeds = np.zeros((8, B), np.int32)
    rng = np.random.default_rng(3)
    for d in range(8):
        seeds[d] = rng.choice(V, B, replace=False)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("data"), P("data")), out_specs=(P(), P()))
    def step(params, seeds, keys):
        seeds = seeds[0]
        batch = device_sample_batch(
            keys[0], seeds, jnp.ones((B,), bool), indptr, indices,
            in_deg, out_deg, feats, labels, (4, 3),
            (128, V),                     # bottom pad == V ⇒ identity srcs
            WeightKind.GCN,
        )

        def loss_fn(p):
            logp = model_forward(p, "gcn", batch)
            return nll_loss_masked(logp, batch.labels, batch.label_valid)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return (jax.lax.pmean(loss, "data"),
                jax.lax.psum(grads.weights[0], "data"))

    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    loss, g0 = step(params, jnp.asarray(seeds), keys)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(g0)))


def test_hm_head_blocked_shrunk_chunk_divisor(monkeypatch):
    """ADVICE r4 (high): the head-blocked multihead path shrinks the scan
    chunk but reused plan.dst_span measured at plan.chunk boundaries — a
    non-divisor shrunk chunk straddles measured runs and clamps REAL edges
    onto wrong rows.  Craft dst runs that are narrow within each plan chunk
    but far apart across chunks, so any straddling sub-chunk's span blows
    the window: windowed must still equal direct (fwd and both grads)."""
    import sgnn_tpu.ops.segment as seg

    heads, fh = 5, 64            # eff_hb = 384: shrink target 12800//384=33
    F = heads * fh
    rng = np.random.default_rng(2)
    S, block_edges, n_blocks, spread = 40, 100, 6, 50
    dst = np.concatenate([
        np.sort(rng.integers(b * spread, b * spread + 4, block_edges))
        for b in range(n_blocks)
    ]).astype(np.int32)
    D = n_blocks * spread
    E = dst.size
    src = rng.integers(0, S, E).astype(np.int32)
    att_hm = rng.standard_normal((heads, E)).astype(np.float32)
    perm = np.argsort(src, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(E, dtype=np.int32)
    x = jnp.asarray(rng.standard_normal((S, F)), jnp.float32)
    aj = jnp.asarray(att_hm)
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    pj, ij = jnp.asarray(perm), jnp.asarray(inv)

    def loss(x_, a_, plan):
        out = seg.spmm_coo_multihead_hm(
            x_, srcj, dstj, a_, D, True, plan, perm=pj, inv_perm=ij)
        return jnp.sum(out * jnp.cos(out))

    l0, (dx0, da0) = jax.value_and_grad(
        functools.partial(loss, plan=None), argnums=(0, 1))(x, aj)
    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 128 * 100)  # plan chunk = 100
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 1)
    planner = seg.SpmmPlanner(dst, src[perm], num_src=S, num_dst=D,
                              e_real=E)
    plan = planner.plan_hm(fh)
    assert plan is not None and plan.chunk == 100
    # the head-blocked target (33) must NOT divide the plan chunk for this
    # test to exercise the straddle; the fix shrinks to a divisor instead
    assert 100 % (seg._CHUNK_ELEMS // seg._eff_feat(heads * fh)) != 0
    assert seg._shrink_chunk_divisor(100, 33) == 25
    l1, (dx1, da1) = jax.value_and_grad(
        functools.partial(loss, plan=plan), argnums=(0, 1))(x, aj)
    # accumulation-order noise only; the straddle bug gives rel err ~1.15
    # here (measured on the pre-fix code), 5 orders of magnitude above tol
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(da1), np.asarray(da0),
                               rtol=1e-3, atol=1e-3)

"""One-hot MXU GAT attention aggregation (ops/pallas/mxu_gat.py):
in-kernel attention weights vs a numpy softmax reference and vs the
windowed fast_att composition (attention_exp + spmm + divide).

Interpret mode on CPU; scripts/probe_gat_kernel_parts.py holds the
on-chip Mosaic validation of the new kernel pieces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgnn_tpu.ops.pallas.mxu_gat import (
    build_mxu_gat_plan,
    mxu_gat_aggregate,
)

KW = dict(s_blk=256, d_blk=512, w_win=128, e_sub=64, e_t=256,
          max_pad_ratio=50.0, chunk_steps=7)


def _rand_graph(rng, v, e, skew=False):
    if skew:
        dst = (rng.zipf(1.5, e) % v).astype(np.int32)
    else:
        dst = rng.integers(0, v, e).astype(np.int32)
    src = rng.integers(0, v, e).astype(np.int32)
    return src, dst


def _ref_gat(src, dst, ht, ts, td, heads, v):
    """numpy attention aggregation with the max-free clamp formulation."""
    f = ht.shape[1]
    fh = f // heads
    out = np.zeros((v, f), np.float64)
    z = np.zeros((v, heads), np.float64)
    for h in range(heads):
        sc = ts[src, h] + td[dst, h]
        sc = np.where(sc >= 0, sc, 0.2 * sc)
        u = np.exp(np.clip(sc, -60.0, 60.0))
        np.add.at(z[:, h], dst, u)
        np.add.at(out[:, h * fh:(h + 1) * fh], dst,
                  u[:, None] * ht[src, h * fh:(h + 1) * fh])
    z = np.maximum(z, np.finfo(np.float32).tiny)
    out3 = out.reshape(v, heads, fh) / z[:, :, None]
    return out3.reshape(v, f)


@pytest.mark.parametrize("heads,f", [(1, 48), (4, 64), (2, 128)])
def test_mxu_gat_matches_reference(heads, f):
    rng = np.random.default_rng(5)
    v, e = 1100, 5000
    src, dst = _rand_graph(rng, v, e, skew=heads == 4)
    plan = build_mxu_gat_plan(src, dst, v, v, **KW)
    assert plan is not None and plan.static.n_chunks >= 2
    ht = rng.standard_normal((v, f)).astype(np.float32) * 0.5
    a = (rng.standard_normal((2 * f, 1)) * 0.2).astype(np.float32)
    a_src, a_dst = a[:f, 0], a[f:, 0]

    out = np.asarray(mxu_gat_aggregate(
        jnp.asarray(ht), jnp.asarray(a_src), jnp.asarray(a_dst),
        *plan.operands, plan.static, heads=heads))

    # bf16-quantized reference: quantize ht and the score tables like the
    # kernel's operands
    htb = np.asarray(jnp.asarray(ht, jnp.bfloat16), np.float32)
    fh = f // heads
    h3 = htb.reshape(v, heads, fh)
    ts = np.einsum("vhf,hf->vh", h3, a_src.reshape(heads, fh))
    td = np.einsum("vhf,hf->vh", h3, a_dst.reshape(heads, fh))
    ts = np.asarray(jnp.asarray(ts, jnp.bfloat16), np.float32)
    td = np.asarray(jnp.asarray(td, jnp.bfloat16), np.float32)
    ref = _ref_gat(src, dst, htb, ts, td, heads, v)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 3e-2  # bf16 kernel numerics


def test_mxu_gat_matches_windowed_fast_att():
    """End-to-end parity with the windowed composition the fullbatch/
    serving GAT path uses (attention_exp clamp + unnormalized spmm +
    divide-after-aggregation)."""
    from sgnn_tpu.ops.segment import attention_exp, spmm_coo

    rng = np.random.default_rng(11)
    v, e, f = 900, 4000, 32
    src, dst = _rand_graph(rng, v, e)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    plan = build_mxu_gat_plan(src, dst, v, v, **KW)
    assert plan is not None
    ht = (rng.standard_normal((v, f)) * 0.5).astype(np.float32)
    a_src = (rng.standard_normal(f) * 0.2).astype(np.float32)
    a_dst = (rng.standard_normal(f) * 0.2).astype(np.float32)

    out = np.asarray(mxu_gat_aggregate(
        jnp.asarray(ht), jnp.asarray(a_src), jnp.asarray(a_dst),
        *plan.operands, plan.static, heads=1))

    htj = jnp.asarray(ht)
    score = jax.nn.leaky_relu(
        (htj @ a_src)[src] + (htj @ a_dst)[dst], 0.2)
    u = attention_exp(score, jnp.ones(e, bool))
    agg = spmm_coo(htj, jnp.asarray(src), jnp.asarray(dst), u, v)
    z = jax.ops.segment_sum(u, jnp.asarray(dst), num_segments=v)
    ref = np.asarray(agg) / np.maximum(np.asarray(z), 1e-30)[:, None]
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 3e-2


@pytest.mark.parametrize("heads", [1, 4])
def test_full_forward_mxu_gat_matches_windowed(heads):
    """Whole-graph GAT forward with the attention kernel == the windowed
    fast_att path, through the same full_forward entry serving uses."""
    from sgnn_tpu.models.gnn import init_model
    from sgnn_tpu.ops.segment import SpmmPlanner
    from sgnn_tpu.train.fullbatch import full_forward

    rng = np.random.default_rng(3)
    v, e, f0, fh1 = 800, 4000, 24, 64
    src, dst = _rand_graph(rng, v, e)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    w = np.ones(e, np.float32)
    plan = build_mxu_gat_plan(src, dst, v, v, **KW)
    assert plan is not None
    planner = SpmmPlanner(dst, src, num_src=v, num_dst=v, e_real=e)
    params = init_model(jax.random.PRNGKey(0), "gat", [f0, fh1, 5])
    # non-trivial attention vectors (init_model zeros them)
    params = params._replace(attn=tuple(
        jnp.asarray(rng.standard_normal(a.shape) * 0.2, jnp.float32)
        for a in params.attn))
    x = jnp.asarray(rng.standard_normal((v, f0)), jnp.float32)
    args = (params, "gat", x, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(w), v)
    kw = dict(heads=heads, fwd_sorted=True, planner=planner)
    ref = np.asarray(full_forward(*args, **kw))
    out = np.asarray(full_forward(
        *args, **kw, mxu_gat=(plan.operands, plan.static)))
    # both are log-probs; bf16 kernel numerics vs the planner path
    assert np.abs(out - ref).max() < 0.15
    agree = (out.argmax(1) == ref.argmax(1)).mean()
    assert agree > 0.98, agree


@pytest.mark.parametrize("heads,f", [(1, 32), (2, 64)])
def test_mxu_gat_train_grads_match_reference(heads, f):
    """mxu_gat_train's two-pass kernel backward == jax.grad of the plain
    max-free attention formulation, for ht AND both attention halves."""
    from sgnn_tpu.ops.pallas.mxu_gat import (
        build_mxu_gat_plan, mxu_gat_train,
    )

    rng = np.random.default_rng(9)
    v, e = 700, 3500
    src, dst = _rand_graph(rng, v, e)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    fwd = build_mxu_gat_plan(src, dst, v, v, **KW)
    bwd = build_mxu_gat_plan(dst, src, v, v, **KW)
    assert fwd is not None and bwd is not None
    ht = jnp.asarray(rng.standard_normal((v, f)) * 0.5, jnp.float32)
    a_s = jnp.asarray(rng.standard_normal(f) * 0.2, jnp.float32)
    a_d = jnp.asarray(rng.standard_normal(f) * 0.2, jnp.float32)
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)

    def loss_kernel(ht, a_s, a_d):
        h = mxu_gat_train(ht, a_s, a_d,
                          *fwd.operands, *bwd.operands,
                          fwd.static, bwd.static, heads)
        return jnp.sum(h * jnp.cos(h))

    def loss_ref(ht, a_s, a_d):
        fh = f // heads
        h3 = ht.reshape(v, heads, fh)
        ts = jnp.einsum("vhf,hf->vh", h3, a_s.reshape(heads, fh))
        td = jnp.einsum("vhf,hf->vh", h3, a_d.reshape(heads, fh))
        sc = jax.nn.leaky_relu(ts[srcj] + td[dstj], 0.2)     # [E, H]
        u = jnp.exp(jnp.clip(sc, -60.0, 60.0))
        z = jax.ops.segment_sum(u, dstj, num_segments=v)
        msg = h3[srcj] * u[:, :, None]
        agg = jax.ops.segment_sum(msg, dstj, num_segments=v)
        h = (agg / jnp.maximum(z, 1e-30)[:, :, None]).reshape(v, f)
        return jnp.sum(h * jnp.cos(h))

    lk, gk = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2))(ht, a_s, a_d)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(ht, a_s, a_d)
    np.testing.assert_allclose(float(lk), float(lr), rtol=2e-2)
    for name, a, b in zip(("dht", "da_src", "da_dst"), gk, gr):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max()
        assert scale > 0, name
        # bf16 kernel operands vs f32 reference: compare at ~bf16 noise
        assert np.abs(a - b).max() / scale < 5e-2, (
            name, np.abs(a - b).max() / scale)
        cos = float((a * b).sum()
                    / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        assert cos > 0.999, (name, cos)


def test_fullbatch_gat_trainer_kernel_matches_windowed(tiny_ds, monkeypatch):
    """FullBatchTrainer(family=gat) with the trainable kernel pair trains
    loss-close to the windowed path (same init/dropout keys) — the
    end-to-end integration of mxu_gat_train."""
    import dataclasses

    import sgnn_tpu.ops.pallas.mxu_gat as mg
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.fullbatch import FullBatchTrainer

    monkeypatch.setattr(mg, "_GAT_GEOMETRIES", ((KW_GEO, 1.0),))
    monkeypatch.setattr(mg, "_GAT_WINDOWED_NS_EDGE", 1e9)
    cfg = RunConfig(layer_sizes=[32, 24, 5], epochs=3, learn_rate=0.02,
                    drop_rate=0.0, vertices=tiny_ds.num_vertices,
                    heads=2, mxu_spmm="on")
    kern = FullBatchTrainer(cfg, tiny_ds, family="gat")
    assert kern.mxu_gat_pair is not None
    wind = FullBatchTrainer(dataclasses.replace(cfg, mxu_spmm="off"),
                            tiny_ds, family="gat")
    assert wind.mxu_gat_pair is None
    for ep in range(3):
        lk, ak, _, _ = kern.train_epoch()
        lw, aw, _, _ = wind.train_epoch()
        # bf16 kernel operands vs f32 windowed: small drift accumulates
        # over updates but trajectories must track closely
        assert abs(lk - lw) < 0.02 + 0.02 * ep, (ep, lk, lw)
    assert np.isfinite(ak) and ak > 0.2  # 3 epochs from zero-init attn
    # predict() rides the kernel forward: compare both PATHS on the SAME
    # params (two separately-trained 3-epoch models differ by bf16 drift
    # on near-uniform logits — path equivalence is the real claim)
    kp = kern.predict().argmax(1)
    wind.params = kern.params
    agree = (kp == wind.predict().argmax(1)).mean()
    assert agree > 0.97, agree


# tiny geometry dict reused by the trainer test (module-level so the
# monkeypatched ladder entry is hashable/stable)
KW_GEO = dict(s_blk=256, d_blk=512, w_win=128, e_sub=64, e_t=256)


def test_mxu_gat_pad_slots_contribute_nothing():
    """Sentinel pads: a plan with heavy padding must produce identical z
    and output as the exact reference (pads would otherwise add exp(0)=1
    to every padded destination's normalizer)."""
    rng = np.random.default_rng(7)
    v, e = 600, 700  # few edges → mostly pad slots
    src, dst = _rand_graph(rng, v, e)
    plan = build_mxu_gat_plan(src, dst, v, v, **KW)
    assert plan is not None
    slots = plan.static.n_steps * plan.static.e_t
    assert slots > 2 * e  # the test is vacuous unless pads dominate
    f = 16
    ht = (rng.standard_normal((v, f)) * 0.5).astype(np.float32)
    a_src = (rng.standard_normal(f) * 0.2).astype(np.float32)
    a_dst = (rng.standard_normal(f) * 0.2).astype(np.float32)
    out = np.asarray(mxu_gat_aggregate(
        jnp.asarray(ht), jnp.asarray(a_src), jnp.asarray(a_dst),
        *plan.operands, plan.static, heads=1))
    htb = np.asarray(jnp.asarray(ht, jnp.bfloat16), np.float32)
    ts = np.asarray(jnp.asarray(htb @ a_src, jnp.bfloat16),
                    np.float32)[:, None]
    td = np.asarray(jnp.asarray(htb @ a_dst, jnp.bfloat16),
                    np.float32)[:, None]
    ref = _ref_gat(src, dst, htb, ts, td, 1, v)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 3e-2

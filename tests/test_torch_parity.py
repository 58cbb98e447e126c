"""Per-layer activation parity against a libtorch-style reference.

BASELINE.md: "Match the reference's per-layer activations (allclose)".
The reference computes with libtorch; torch (CPU) is available here, so
these tests rebuild the reference engines' exact math in torch on the SAME
sampled block with the SAME weights and compare activations elementwise.

GCN/SAGE layer (GCN_SAMPLE_ALLGPU.hpp:247-260):
    Y = SpMM(block, X);  X' = relu(Y·W)  (log_softmax at the last layer)
GAT layer (GAT_SAMPLE_ALL_GPU.hpp:308-393):
    H = X·W; e = leaky_relu([H_src‖H_dst]·a, 0.2); att = edge_softmax(e)
    X' = relu(Σ att·H_src)
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.models.gnn import GNNParams, model_forward
from sgnn_tpu.sampler.host import HostSampler
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.train.trainer import host_batch_to_device


@pytest.fixture(scope="module")
def block_setup(tiny_ds):
    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    sampler = HostSampler(adj, fanouts=[5], batch_size=24, seed=4,
                          weight_kind=WeightKind.GCN, use_native=False)
    hb = sampler.sample(np.arange(24, dtype=np.int32))
    x0, y, yv = hb.payload(tiny_ds.features, tiny_ds.labels)
    batch = host_batch_to_device(hb, x0, y, yv)
    return hb, batch


def _dense_block(hb):
    """(A[D,S], x-mask) dense matrix of the sampled block."""
    b = hb.blocks[0]
    D, S = b.nbr.shape[0], b.srcs.shape[0]
    A = np.zeros((D, S), np.float32)
    for d in range(D):
        for k in range(b.nbr.shape[1]):
            A[d, b.nbr[d, k]] += b.weight[d, k]
    return A


def test_gcn_layer_activations_match_torch(block_setup, tiny_ds):
    hb, batch = block_setup
    rng = np.random.default_rng(0)
    W = rng.standard_normal((32, 7)).astype(np.float32) * 0.1

    # ours (single GCN layer → log_softmax since it's the last layer)
    params = GNNParams(weights=(jnp.asarray(W),), attn=())
    ours = np.asarray(model_forward(params, "gcn", batch))

    # torch reference: SpMM then matmul then log_softmax
    A = torch.from_numpy(_dense_block(hb))
    X = torch.from_numpy(np.asarray(batch.x0))
    Y = A @ X
    logp = torch.log_softmax(Y @ torch.from_numpy(W), dim=1)
    np.testing.assert_allclose(ours, logp.numpy(), rtol=2e-4, atol=1e-5)


def test_gat_layer_activations_match_torch(block_setup, tiny_ds):
    hb, batch = block_setup
    rng = np.random.default_rng(1)
    F_out = 6
    W = rng.standard_normal((32, F_out)).astype(np.float32) * 0.2
    a = rng.standard_normal((2 * F_out, 1)).astype(np.float32) * 0.2

    params = GNNParams(weights=(jnp.asarray(W),), attn=(jnp.asarray(a),))
    ours = np.asarray(model_forward(params, "gat", batch))

    # torch reference, edge-list form exactly like the reference engine
    b = hb.blocks[0]
    X = torch.from_numpy(np.asarray(batch.x0))
    H = X @ torch.from_numpy(W)
    tW = torch.from_numpy(a)
    D, K = b.nbr.shape
    out = torch.zeros((D, F_out))
    for d in range(b.num_dst):
        ks = np.nonzero(b.weight[d] != 0)[0]
        if ks.size == 0:
            continue
        h_src = H[torch.from_numpy(b.nbr[d, ks].astype(np.int64))]
        h_dst = H[int(b.seed_in_src[d])].expand(len(ks), F_out)
        e = torch.cat([h_src, h_dst], dim=1) @ tW
        e = torch.nn.functional.leaky_relu(e, 0.2).squeeze(1)
        att = torch.softmax(e, dim=0)
        out[d] = (att[:, None] * h_src).sum(0)
    expect = torch.log_softmax(torch.relu(out), dim=1).numpy()
    np.testing.assert_allclose(
        ours[: b.num_dst], expect[: b.num_dst], rtol=2e-3, atol=2e-4
    )


def test_adam_update_matches_torch_semantics():
    """ReferenceAdam (uncorrected GPU rule) vs a hand-built torch loop."""
    from sgnn_tpu.nn.optim import ReferenceAdam

    rng = np.random.default_rng(2)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    opt = ReferenceAdam(learn_rate=0.01, weight_decay=1e-4)
    p = {"w": jnp.asarray(w0)}
    st = opt.init(p)
    tw = torch.from_numpy(w0.copy())
    m = torch.zeros_like(tw)
    v = torch.zeros_like(tw)
    for step in range(5):
        g_np = rng.standard_normal((4, 3)).astype(np.float32)
        p, st = opt.update({"w": jnp.asarray(g_np)}, st, p)
        # torch replica of learn_local_with_decay_Adam (NtsScheduler.hpp:937)
        g = torch.from_numpy(g_np) + 1e-4 * tw
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        tw = tw - 0.01 * m / (torch.sqrt(v) + 1e-9)
    np.testing.assert_allclose(np.asarray(p["w"]), tw.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_gat_accuracy_matches_torch_anchor(cora):
    """External GAT anchor (VERDICT item): a reference-structure torch GAT
    (single head, score = leaky_relu(a_src·Wh_src + a_dst·Wh_dst), per-dst
    softmax, relu every layer, log_softmax head, bias-corrected Adam — the
    structure of GAT_SAMPLE_ALL_GPU.hpp:308-393 + learnC2G_with_decay_Adam)
    trained full-neighborhood on the same Cora split, vs our GATSAMPLEALLGPU
    engine.  Ours must land within a few points of the torch anchor."""
    import torch

    from sgnn_tpu.config import load_cfg
    from sgnn_tpu.data.nts_format import load_from_config
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.train import run_engine

    torch.manual_seed(0)
    adj = Adjacency.from_edges(cora.edges, cora.num_vertices)
    v = cora.num_vertices
    dst_t = torch.from_numpy(
        np.repeat(np.arange(v, dtype=np.int64),
                  np.diff(adj.indptr).astype(np.int64))
    )
    src_t = torch.from_numpy(adj.indices.astype(np.int64))
    x = torch.from_numpy(np.asarray(cora.features, np.float32))
    y = torch.from_numpy(cora.labels.astype(np.int64))
    train_mask = torch.from_numpy(np.asarray(cora.masks == 0))

    sizes = [1433, 256, 7]
    ws = [torch.nn.Parameter(torch.nn.init.xavier_uniform_(
        torch.empty(sizes[i], sizes[i + 1]))) for i in range(2)]
    ats = [torch.nn.Parameter(torch.nn.init.xavier_uniform_(
        torch.empty(2 * sizes[i + 1], 1))) for i in range(2)]
    opt = torch.optim.Adam(ws + ats, lr=0.01, weight_decay=1e-4)

    def gat_layer(h, w, a):
        ht = h @ w
        f = ht.shape[1]
        score = ht[src_t] @ a[:f, 0] + ht[dst_t] @ a[f:, 0]
        score = torch.nn.functional.leaky_relu(score, 0.2)
        mx = torch.full((v,), -1e30).index_reduce_(
            0, dst_t, score, "amax", include_self=False)
        ex = torch.exp(score - mx[dst_t])
        den = torch.zeros(v).index_add_(0, dst_t, ex)
        att = ex / den[dst_t].clamp_min(1e-12)
        out = torch.zeros(v, f).index_add_(0, dst_t, att[:, None] * ht[src_t])
        return torch.relu(out)

    for _ in range(40):
        opt.zero_grad()
        h = gat_layer(x, ws[0], ats[0])
        h = gat_layer(h, ws[1], ats[1])
        logp = torch.log_softmax(h, dim=1)
        loss = torch.nn.functional.nll_loss(logp[train_mask], y[train_mask])
        loss.backward()
        opt.step()
    with torch.no_grad():
        pred = gat_layer(gat_layer(x, ws[0], ats[0]), ws[1], ats[1]).argmax(1)
        torch_acc = float((pred[train_mask] == y[train_mask]).float().mean())

    cfg = load_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                                "gcn_cora_sample.cfg"))
    cfg.algorithm = "GATSAMPLEALLGPU"
    cfg.epochs = 40
    report = run_engine(cfg, load_from_config(cfg))
    ours = max(report.train_acc)
    # torch full-neighborhood anchor ~0.95; sampled single-head GAT must be
    # within a few points (VERDICT asked >= 0.88)
    assert torch_acc > 0.90, torch_acc
    assert ours >= torch_acc - 0.06, (ours, torch_acc)
    assert ours >= 0.88, ours

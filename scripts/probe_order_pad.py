"""VERDICT r4 #5: tile-density-aware ordering × geometry, host-side.

Evaluates the MXU planner's own pad objective (estimated slots) for the
whole-graph plan at a given bench scale across vertex orderings
(none / degree / bfs / rcm / hub+rcm) and geometry rungs (including the
new split-window rungs the r5 alignment fix makes runnable).  Pure host
work — run alongside chip jobs.

Usage: python scripts/probe_order_pad.py [scale]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

from sgnn_tpu.data.dataset import Dataset
from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.graph.reorder import vertex_order
from sgnn_tpu.ops.pallas.mxu_spmm import _estimate_slots
from sgnn_tpu.utils.io import load_npy

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
_stem = f"/root/.cache/sgnn_datasets/reddit_like_s{scale}_seed0"
z = {k: load_npy(f"{_stem}.{k}.npy") for k in ("num_vertices", "edges")}
V = int(z["num_vertices"])
edges = z["edges"]
E = edges.shape[0]
print(f"scale {scale}: V={V} E={E}", flush=True)
src = edges[:, 0].astype(np.int64)
dst = edges[:, 1].astype(np.int64)

adj = Adjacency.from_edges(edges, V)
deg_in = np.diff(adj.indptr)


def rcm_order():
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    m = csr_matrix((np.ones(E, np.int8), (src, dst)), shape=(V, V))
    m = m + m.T
    return np.asarray(reverse_cuthill_mckee(m, symmetric_mode=True),
                      np.int64)


def hub_front(base_order, hub_frac=0.02):
    """Move the top hub_frac of vertices (by in-degree) to a compact id
    prefix; keep base_order among the rest.  Hubs appear in nearly every
    dst block's slab set — compacting them into one dense shared slab
    removes V/s_blk sparse groups per hub."""
    n_hub = int(V * hub_frac)
    hubs = np.argsort(-deg_in, kind="stable")[:n_hub]
    is_hub = np.zeros(V, bool)
    is_hub[hubs] = True
    rest = base_order[~is_hub[base_order]]
    return np.concatenate([hubs.astype(np.int64), rest.astype(np.int64)])


ORDERS = {"none": None}
t0 = time.time()
ORDERS["degree"] = vertex_order(adj, "degree").astype(np.int64)
print(f"degree order: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
try:
    ORDERS["rcm"] = rcm_order()
    print(f"rcm order: {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"rcm failed: {e!r}", flush=True)
if "rcm" in ORDERS:
    ORDERS["hub2+rcm"] = hub_front(ORDERS["rcm"], 0.02)
    ORDERS["hub5+rcm"] = hub_front(ORDERS["rcm"], 0.05)
ORDERS["hub2+none"] = hub_front(np.arange(V, dtype=np.int64), 0.02)

GEOMS = [
    ("s1024/w1280/e256", dict(s_blk=1024, e_sub=256, e_t=2048), 3.84),
    ("s2048/w1280/e256", dict(s_blk=2048, e_sub=256, e_t=2048), 5.64),
    ("s4096(sw2048)/w2048/e256", dict(s_blk=4096, e_sub=256, e_t=2048), 6.83),
    ("s8192(sw2048)/w2048/e256", dict(s_blk=8192, e_sub=256, e_t=2048), 6.83),
    ("s2048/w1280 e128/et1024", dict(s_blk=2048, e_sub=128, e_t=1024), 9.50),
]

for oname, order in ORDERS.items():
    if order is None:
        s2, d2 = src, dst
    else:
        old_to_new = np.empty(V, np.int64)
        old_to_new[order] = np.arange(V, dtype=np.int64)
        s2, d2 = old_to_new[src], old_to_new[dst]
    row = [f"{oname:>10}"]
    for gname, gkw, rate in GEOMS:
        est = max(_estimate_slots(s2, d2, V, **gkw),
                  _estimate_slots(d2, s2, V, **gkw))
        pad = est / E
        row.append(f"{gname}: pad {pad:.2f} -> {rate*pad:.1f} ns/e")
    print(" | ".join(row), flush=True)

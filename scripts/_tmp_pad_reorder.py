import sys; sys.path.insert(0, ".")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from sgnn_tpu.utils.io import load_npy
from sgnn_tpu.data.dataset import Dataset
from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.graph.reorder import vertex_order, apply_vertex_order
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.train.fullbatch import build_coo
from sgnn_tpu.ops.pallas.mxu_spmm import build_mxu_spmm_plan

_stem = "/root/.cache/sgnn_datasets/reddit_like_s4.0_seed0"
z = {k: load_npy(f"{_stem}.{k}.npy")
     for k in ("num_vertices", "edges", "features", "labels", "masks")}
ds0 = Dataset(num_vertices=int(z["num_vertices"]), edges=z["edges"],
              features=None, labels=None, masks=None, name="rl4")
for mode in ("none", "degree", "bfs"):
    ds = ds0 if mode == "none" else apply_vertex_order(
        Dataset(num_vertices=ds0.num_vertices, edges=ds0.edges,
                features=np.zeros((ds0.num_vertices, 1), np.float32),
                labels=np.zeros(ds0.num_vertices, np.int32),
                masks=np.zeros(ds0.num_vertices, np.int32), name="x"),
        vertex_order(ds0, mode))[0]
    adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
    src, dst, w = build_coo(adj, WeightKind.GCN)
    v = ds.num_vertices
    for kw in [dict(), dict(s_blk=2048), dict(s_blk=2048, e_t=4096)]:
        p = build_mxu_spmm_plan(src, dst, w, v, v, max_pad_ratio=8.0, **kw)
        pr = None if p is None else round(p.pad_ratio(adj.num_edges), 2)
        print(f"{mode} {kw}: pad={pr}", flush=True)

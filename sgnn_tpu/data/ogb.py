"""OGB → framework dataset conversion.

Reference: data/OGBData/transOGBData_To_NeutronStarData.py + run.sh +
convert2binary.cpp — converts ogbn-arxiv / ogbn-products node-property
datasets into the NTS 4-file format (edge binary with self-loops +
feature/label/mask text tables).  Unsupported there and here: heterogeneous
(mag), edge-feature-only (proteins) graphs.

This module both (a) loads an OGB dataset directly into a Dataset (no
intermediate text files) and (b) exports the NTS 4-file format for
interchange with the reference binary.  The `ogb` pip package is optional —
a pre-downloaded OGB directory layout is also read directly.
"""

from __future__ import annotations

import gzip
import os
from typing import Optional

import numpy as np

from .dataset import Dataset, MASK_NONE, MASK_TEST, MASK_TRAIN, MASK_VAL
from .nts_format import write_edge_binary
from ..utils.logging import get_logger

log = get_logger("sgnn.ogb")


def _read_csv_gz(path: str, dtype) -> np.ndarray:
    with gzip.open(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def load_ogb_dir(root: str, name: str = "dataset") -> Dataset:
    """Load a standard OGB node-prop dataset directory (raw/ + split/).

    Expects the layout ogb's `NodePropPredDataset` downloads:
      raw/edge.csv.gz, raw/node-feat.csv.gz, raw/node-label.csv.gz,
      split/<split_name>/{train,valid,test}.csv.gz
    """
    raw = os.path.join(root, "raw")
    edges = _read_csv_gz(os.path.join(raw, "edge.csv.gz"), np.int64)
    feats = _read_csv_gz(os.path.join(raw, "node-feat.csv.gz"), np.float32)
    labels = _read_csv_gz(os.path.join(raw, "node-label.csv.gz"), np.int64)
    v = feats.shape[0]
    masks = np.full(v, MASK_NONE, dtype=np.int32)
    split_root = os.path.join(root, "split")
    if os.path.isdir(split_root):
        split_name = sorted(os.listdir(split_root))[0]
        sp = os.path.join(split_root, split_name)
        for fname, code in (("train", MASK_TRAIN), ("valid", MASK_VAL),
                            ("test", MASK_TEST)):
            p = os.path.join(sp, f"{fname}.csv.gz")
            if os.path.exists(p):
                ids = _read_csv_gz(p, np.int64).ravel()
                masks[ids] = code
    ds = Dataset(
        num_vertices=v,
        edges=edges.astype(np.int32),
        features=feats,
        labels=labels.ravel().astype(np.int32),
        masks=masks,
        name=name,
    )
    ds = ds.add_self_loops()  # reference conversion appends self-loops
    ds.validate()
    return ds


def load_ogb(name: str, root: Optional[str] = None) -> Dataset:
    """Load via the `ogb` package if installed, else from a local dir."""
    try:
        from ogb.nodeproppred import NodePropPredDataset  # optional dep

        d = NodePropPredDataset(name=name, root=root or "ogb_data")
        graph, labels = d[0]
        split = d.get_idx_split()
        v = graph["num_nodes"]
        masks = np.full(v, MASK_NONE, dtype=np.int32)
        masks[split["train"]] = MASK_TRAIN
        masks[split["valid"]] = MASK_VAL
        masks[split["test"]] = MASK_TEST
        ds = Dataset(
            num_vertices=v,
            edges=graph["edge_index"].T.astype(np.int32),
            features=graph["node_feat"].astype(np.float32),
            labels=labels.ravel().astype(np.int32),
            masks=masks,
            name=name,
        ).add_self_loops()
        ds.validate()
        return ds
    except ImportError:
        if root is None:
            raise RuntimeError(
                "ogb package not installed; pass root= pointing at a "
                "downloaded OGB dataset directory"
            )
        return load_ogb_dir(root, name)


_MASK_NAMES = {MASK_TRAIN: "train", MASK_VAL: "val", MASK_TEST: "test",
               MASK_NONE: "unknown"}


def export_nts_format(ds: Dataset, out_dir: str, prefix: Optional[str] = None):
    """Write the reference's 4-file format (edge binary + text tables).

    Produces files a reference `nts` binary can consume (run.sh parity:
    `<name>.edge.self` binary + featuretable/labeltable/mask).
    """
    os.makedirs(out_dir, exist_ok=True)
    prefix = prefix or ds.name
    base = os.path.join(out_dir, prefix)
    write_edge_binary(f"{base}.{ds.num_vertices}.edge.self", ds.edges)
    with open(f"{base}.featuretable", "w") as f:
        for i in range(ds.num_vertices):
            row = " ".join(repr(float(x)) for x in ds.features[i])
            f.write(f"{i} {row}\n")
    with open(f"{base}.labeltable", "w") as f:
        for i in range(ds.num_vertices):
            f.write(f"{i} {int(ds.labels[i])}\n")
    with open(f"{base}.mask", "w") as f:
        for i in range(ds.num_vertices):
            f.write(f"{i} {_MASK_NAMES[int(ds.masks[i])]}\n")
    log.info("exported NTS-format dataset to %s.*", base)
    return base

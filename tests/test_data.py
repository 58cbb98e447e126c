"""Data-layer tests: NTS file-format readers against the shipped Cora files."""

import numpy as np

from sgnn_tpu.data.dataset import MASK_TEST, MASK_TRAIN, MASK_VAL
from sgnn_tpu.config import parse_cfg_text, load_cfg


def test_cora_shapes(cora):
    assert cora.num_vertices == 2708
    assert cora.num_edges == 13566       # .self file: 10858 + 2708 self loops
    assert cora.features.shape == (2708, 1433)
    assert cora.labels.shape == (2708,)
    assert cora.num_classes == 7


def test_cora_self_loops(cora):
    self_loops = cora.edges[cora.edges[:, 0] == cora.edges[:, 1]]
    assert len(self_loops) == 2708


def test_cora_masks(cora):
    # reference log: Train Acc computed over 1605 train vertices
    # (log/cora_gcn/output.log "Train Acc: 0.928972 (1491/1605)")
    assert (cora.masks == MASK_TRAIN).sum() == 1605
    assert (cora.masks == MASK_VAL).sum() > 0
    assert (cora.masks == MASK_TEST).sum() > 0


def test_cfg_parse_reference_file():
    cfg = load_cfg("/root/repo/configs/gcn_cora_sample.cfg")
    assert cfg.algorithm == "GCNSAMPLEPDCACHE"
    assert cfg.layer_sizes == [1433, 256, 7]
    assert cfg.fanout == [25, 10]
    assert cfg.vertices == 2708
    assert cfg.learn_rate == 0.01


def test_cfg_parse_text():
    cfg = parse_cfg_text(
        "ALGORITHM:GSSAMPLEALLGPU\nLAYERS:602-128-41\nFANOUT:10-25\n"
        "# comment\nBATCH_SIZE:512\nWEIGHT_DECAY:0.0001\nCACHE:1\n"
    )
    assert cfg.algorithm == "GSSAMPLEALLGPU"
    assert cfg.layer_sizes == [602, 128, 41]
    assert cfg.fanout == [10, 25]
    assert cfg.batch_size == 512
    assert cfg.cache is True


def test_synthetic_powerlaw(tiny_ds):
    tiny_ds.validate()
    assert tiny_ds.num_vertices == 500
    assert tiny_ds.features.shape == (500, 32)

"""Smoke the five BASELINE benchmark configs at tiny scales (CPU)."""

import numpy as np
import pytest

from correrender_tpu.app import baseline_configs as bc


def test_config1_synth_box():
    row = bc.config1_synth_box_pearson_dvr(grid=(16, 16, 8), members=12)
    assert row["fused_field_plus_render_ms"] > 0


def test_config2_ranks():
    row = bc.config2_rank_correlations(grid=(12, 8, 6), members=30)
    assert row["spearman_voxels_per_s"] > 0
    assert row["kendall_voxels_per_s"] > 0


def test_config3_mi():
    row = bc.config3_mutual_information(grid=(8, 8, 4), members=40)
    assert row["binned_ms"] > 0 and row["ksg_ms"] > 0


def test_config4_timelag_zarr(tmp_path):
    row = bc.config4_timelag_zarr_flythrough(tmp_dir=str(tmp_path))
    assert row["frames"] == 4
    assert row["ms_per_frame"] > 0


def test_config5_sharded(tmp_path):
    row = bc.config5_sharded_batch_render(grid=(16, 16, 8), members=16)
    assert row["devices"] >= 1
    assert row["export_bytes"] > 0

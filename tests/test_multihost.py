"""Multi-process (multi-host) execution path.

Default tier: the mesh/loading helpers in a single process (the
num_processes=1 degenerate case runs the same code paths minus gRPC).
Opt-in tier (CORRERENDER_MULTIHOST=1): spawns real OS processes with a
gRPC coordinator via tools/multihost_run.py — the evidence generator
behind MULTIHOST_r05.json. Kept opt-in because each worker pays full
JAX import + compile (~1 min wall on the 1-core CI host).
"""

import os
import sys

import numpy as np
import pytest

from correrender_tpu.parallel import multihost as mh


class TestHelpers:
    def test_process_spanning_mesh_member_columns(self):
        mesh = mh.process_spanning_mesh(2, 4)
        assert mesh.devices.shape == (2, 4)
        assert mesh.axis_names == ("space", "members")
        # Column-major device assignment: column m = devices
        # [m*space, (m+1)*space) — whole columns per process.
        import jax

        devs = jax.devices()
        for m in range(4):
            assert [d.id for d in mesh.devices[:, m]] == [
                devs[m * 2].id, devs[m * 2 + 1].id]

    def test_member_range_single_process_is_full(self):
        mesh = mh.process_spanning_mesh(2, 4)
        assert mh.process_member_range(mesh, 16) == (0, 16)

    def test_member_range_rejects_indivisible(self):
        mesh = mh.process_spanning_mesh(2, 4)
        with pytest.raises(ValueError, match="not divisible"):
            mh.process_member_range(mesh, 10)

    def test_stack_assembly_matches_device_put(self):
        from correrender_tpu.parallel.mesh import shard_member_stack

        mesh = mh.process_spanning_mesh(2, 4)
        rng = np.random.default_rng(0)
        full = rng.normal(size=(8, 5, 5, 8)).astype(np.float32)
        arr = mh.member_stack_from_local(full, mesh, 8)
        want = shard_member_stack(full, mesh)
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(want))
        assert arr.sharding == want.sharding

    def test_series_assembly_and_replicate(self):
        mesh = mh.process_spanning_mesh(2, 4)
        s = np.arange(16, dtype=np.float32)
        arr = mh.member_series_from_local(s, mesh, 16)
        np.testing.assert_array_equal(
            mh.replicate_to_host(arr, mesh), s)

    def test_sharded_pearson_on_assembled_stack(self):
        from correrender_tpu.parallel.pearson_sharded import (
            pearson_member_sharded,
        )
        from correrender_tpu.ops.pearson import pearson

        mesh = mh.process_spanning_mesh(2, 4)
        rng = np.random.default_rng(1)
        full = rng.normal(size=(8, 6, 6, 16)).astype(np.float32)
        stack = mh.member_stack_from_local(full, mesh, 16)
        ref = mh.member_series_from_local(
            np.ascontiguousarray(full[4, 3, 3]), mesh, 16)
        got = mh.replicate_to_host(
            pearson_member_sharded(stack, ref, mesh), mesh)
        want = np.asarray(pearson(full[4, 3, 3], full))
        np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.skipif(
    os.environ.get("CORRERENDER_MULTIHOST") != "1",
    reason="opt-in: spawns 2 OS processes with a gRPC coordinator "
           "(set CORRERENDER_MULTIHOST=1)")
def test_real_multiprocess_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.multihost_run import run

    result = run(processes=2, local_devices=2, space=2,
                 out=str(tmp_path / "mh.json"),
                 zs=16, ys=24, xs=24, members_data=8)
    assert result["ok"]
    assert result["num_processes"] == 2
    assert result["reshard_max_delta"] == 0.0
    assert result["pearson_max_delta_vs_f64"] < 1e-5


@pytest.mark.skipif(
    os.environ.get("CORRERENDER_MULTIHOST") != "1",
    reason="opt-in: spawns 2 OS processes with a gRPC coordinator "
           "(set CORRERENDER_MULTIHOST=1)")
def test_real_multiprocess_zarr_store(tmp_path):
    """Per-host member loading from a Zarr store (the other half of
    SCALING.md's 'NetCDF/Zarr' input-pipeline claim)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tools.multihost_run import run

    result = run(processes=2, local_devices=2, space=2,
                 out=str(tmp_path / "mh.json"),
                 zs=16, ys=24, xs=24, members_data=8,
                 store_suffix=".zarr")
    assert result["ok"]
    assert result["store"] == "zarr"

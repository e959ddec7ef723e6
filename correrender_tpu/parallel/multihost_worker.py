"""Per-process worker for the multi-host execution path.

One instance of this module runs per host (``python -m
correrender_tpu.parallel.multihost_worker``). Each worker:

1. joins the coordination service (:func:`multihost.initialize_process`),
2. builds the process-spanning ``(space, members)`` mesh,
3. loads ONLY its member block from the NetCDF/Zarr store
   (the per-host DCN input pipeline of docs/SCALING.md),
4. assembles the global member-sharded stack with zero host exchange,
5. runs the member-sharded Pearson (psum moments across processes),
   the member→space all-to-all reshard, and a post-reshard rank
   program (Spearman) on the resharded layout,
6. validates every result against f64 host math on process 0 and
   writes a JSON evidence file.

Launch via ``tools/multihost_run.py`` (spawns N local processes with a
gRPC coordinator on localhost — the executable multi-host simulation;
on a real pod slice each host runs this worker with no coordinator
args).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _rank_f64(a: np.ndarray, axis: int = -1) -> np.ndarray:
    """Average-tie ranks (scipy.stats.rankdata semantics), f64."""
    order = np.argsort(a, axis=axis, kind="stable")
    ranks = np.empty_like(order, dtype=np.float64)
    np.put_along_axis(
        ranks, order,
        np.broadcast_to(
            np.arange(1, a.shape[axis] + 1, dtype=np.float64),
            order.shape),
        axis=axis)
    # Average ties.
    sorted_a = np.take_along_axis(a, order, axis=axis)
    sorted_r = np.take_along_axis(ranks, order, axis=axis)
    out = sorted_r.copy()
    n = a.shape[axis]
    a2 = np.moveaxis(sorted_a, axis, -1).reshape(-1, n)
    r2 = np.moveaxis(out, axis, -1).reshape(-1, n)
    for row_a, row_r in zip(a2, r2):
        i = 0
        while i < n:
            j = i
            while j + 1 < n and row_a[j + 1] == row_a[i]:
                j += 1
            if j > i:
                row_r[i:j + 1] = row_r[i:j + 1].mean()
            i = j + 1
    out = np.moveaxis(r2.reshape(np.moveaxis(sorted_a, axis, -1).shape),
                      -1, axis)
    inv = np.empty_like(order)
    np.put_along_axis(inv, order,
                      np.broadcast_to(np.arange(n), order.shape),
                      axis=axis)
    return np.take_along_axis(out, inv, axis=axis)


def _pearson_f64(stack: np.ndarray, ref: np.ndarray) -> np.ndarray:
    x = ref.astype(np.float64)
    y = stack.astype(np.float64)
    xm = x - x.mean()
    ym = y - y.mean(axis=-1, keepdims=True)
    num = (ym * xm).sum(-1)
    den = np.sqrt((xm * xm).sum() * (ym * ym).sum(-1))
    with np.errstate(invalid="ignore", divide="ignore"):
        return num / den


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, required=True)
    ap.add_argument("--space", type=int, required=True)
    ap.add_argument("--members", type=int, required=True,
                    help="members mesh-axis size")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--field", default=None)
    ap.add_argument("--ref", default=None,
                    help="reference voxel z,y,x (default: center)")
    ap.add_argument("--out", default=None,
                    help="process 0 writes the evidence JSON here")
    args = ap.parse_args(argv)

    from correrender_tpu.parallel import multihost as mh

    jax = mh.initialize_process(
        args.coordinator, args.num_processes, args.process_id,
        local_devices=args.local_devices)
    pid = jax.process_index()
    mesh = mh.process_spanning_mesh(args.space, args.members)

    # -- per-process input pipeline: load only this host's members ----
    from correrender_tpu.io.base import loader_for_path

    loader = loader_for_path(args.dataset).open(args.dataset)
    field = args.field or loader.field_names[0]
    num_members = int(loader.es)
    lo, hi = mh.process_member_range(mesh, num_members)
    t_load = time.monotonic()
    local = np.stack(
        [loader.load_field(field, time=0, member=e)
         for e in range(lo, hi)], axis=-1).astype(np.float32)
    t_load = time.monotonic() - t_load
    zs, ys, xs = local.shape[:3]
    if args.ref:
        rz, ry, rx = (int(v) for v in args.ref.split(","))
    else:
        rz, ry, rx = zs // 2, ys // 2, xs // 2

    stack = mh.member_stack_from_local(local, mesh, num_members)
    ref = mh.member_series_from_local(
        np.ascontiguousarray(local[rz, ry, rx, :]), mesh, num_members)

    # -- member-sharded Pearson (psum moments across processes) -------
    from correrender_tpu.parallel.pearson_sharded import (
        correlate_space_sharded,
        pearson_member_sharded,
    )

    r = pearson_member_sharded(stack, ref, mesh)  # warm/compile
    jax.block_until_ready(r)
    t0 = time.monotonic()
    r = pearson_member_sharded(stack, ref, mesh)
    jax.block_until_ready(r)
    pearson_ms = (time.monotonic() - t0) * 1e3
    pearson_np = mh.replicate_to_host(r, mesh)

    # -- member→space reshard (all_to_all across processes) -----------
    from correrender_tpu.parallel.mesh import reshard_member_to_space

    rstack, _ = reshard_member_to_space(stack, mesh)
    jax.block_until_ready(rstack)
    t0 = time.monotonic()
    rstack2, _ = reshard_member_to_space(stack, mesh)
    jax.block_until_ready(rstack2)
    reshard_ms = (time.monotonic() - t0) * 1e3

    # -- post-reshard rank program on the space layout -----------------
    full_ref = mh.replicate_to_host(ref, mesh)
    sp = correlate_space_sharded(rstack, full_ref, mesh, "spearman")
    jax.block_until_ready(sp)
    spearman_np = mh.replicate_to_host(sp, mesh)

    # -- validation (f64 host math on process 0) ----------------------
    # The gathers are collectives: EVERY process must join them even
    # though only process 0 reads the result (skipping them on other
    # ranks deadlocks the compiled all-gather).
    gathered = mh.replicate_to_host(stack, mesh)
    gathered_r = mh.replicate_to_host(rstack, mesh)
    result = None
    if pid == 0:
        reshard_delta = float(np.abs(gathered - gathered_r).max())
        want_p = _pearson_f64(gathered, full_ref)
        d_p = float(np.nanmax(np.abs(pearson_np - want_p)))
        # Equality vs the single-process estimator (one local device,
        # same f32 kernel the dense path runs everywhere).
        from correrender_tpu.ops.pearson import pearson as _pearson_op

        single = np.asarray(_pearson_op(
            jax.device_put(full_ref, jax.local_devices()[0]),
            jax.device_put(gathered, jax.local_devices()[0])))
        d_sp = float(np.nanmax(np.abs(pearson_np - single)))
        ranks = _rank_f64(gathered)
        want_s = _pearson_f64(ranks, _rank_f64(full_ref[None])[0])
        d_s = float(np.nanmax(np.abs(spearman_np - want_s)))
        result = {
            "ok": bool(d_p < 1e-4 and d_s < 1e-4 and d_sp < 1e-5
                       and reshard_delta == 0.0),
            "num_processes": int(jax.process_count()),
            "local_devices": int(args.local_devices),
            "mesh": f"{args.space}x{args.members}",
            "grid": [int(zs), int(ys), int(xs)],
            "members": int(num_members),
            "members_loaded_per_process": int(hi - lo),
            "pearson_max_delta_vs_f64": d_p,
            "pearson_max_delta_vs_singleproc": d_sp,
            "spearman_max_delta_vs_f64": d_s,
            "reshard_max_delta": reshard_delta,
            "pearson_warm_ms": round(pearson_ms, 2),
            "reshard_warm_ms": round(reshard_ms, 2),
            "load_s_per_process": round(t_load, 2),
            "store": args.dataset.rsplit(".", 1)[-1],
        }
        text = json.dumps(result)
        print(text, flush=True)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text + "\n")
    close = getattr(loader, "close", None)
    if close is not None:
        close()
    jax.distributed.shutdown()
    return 0 if (pid != 0 or result["ok"]) else 1


if __name__ == "__main__":
    raise SystemExit(main())

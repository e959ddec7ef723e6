"""Launch the multi-host execution simulation on localhost.

Spawns N OS processes of ``correrender_tpu.parallel.multihost_worker``
with a real gRPC coordination service — the executable form of the
multi-host design in docs/SCALING.md. Each process sees only its own
(virtual CPU) devices, loads only its member block from the store, and
the processes form one logical mesh; every collective (psum moments,
the member→space all_to_all, result all-gathers) crosses real process
boundaries over gloo, standing in for DCN/ICI on a pod.

    python tools/multihost_run.py --processes 2 --local-devices 4 \
        --space 2 --out MULTIHOST_r05.json

Prints the worker's evidence JSON (one line) and exits non-zero if any
worker fails or validation misses.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def make_dataset(path: str, zs=32, ys=48, xs=48, members=16) -> str:
    """Synthetic NetCDF or Zarr ensemble for the simulation (chosen
    by the path suffix — both stores support per-member reads, the
    property the per-host input pipeline relies on)."""
    sys.path.insert(0, REPO)
    from correrender_tpu.io import writers
    from correrender_tpu.utils import fixtures

    data = fixtures.synth_box_ensemble(
        xs=xs, ys=ys, zs=zs, members=members)
    if path.endswith(".zarr"):
        writers.write_zarr(path, data[:, None])  # (E, T, Z, Y, X)
    else:
        writers.write_netcdf(path, data[:, None])
    return path


def run(processes=2, local_devices=4, space=2, dataset=None,
        out=None, zs=32, ys=48, xs=48, members_data=16,
        timeout=900, store_suffix=".nc") -> dict:
    members_axis = processes * local_devices // space
    if space * members_axis != processes * local_devices:
        raise SystemExit("space must divide processes*local_devices")
    tmp = None
    if dataset is None:
        tmp = tempfile.mkdtemp(prefix="mh_")
        dataset = make_dataset(
            os.path.join(tmp, "ens" + store_suffix),
            zs=zs, ys=ys, xs=xs, members=members_data)
    port = _free_port()
    out_path = out or os.path.join(tmp or tempfile.gettempdir(),
                                   "multihost.json")
    procs = []
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Workers force JAX_PLATFORMS/XLA_FLAGS themselves before backend
    # init (multihost.initialize_process); nothing to scrub here.
    for pid in range(processes):
        cmd = [
            sys.executable, "-m",
            "correrender_tpu.parallel.multihost_worker",
            "--coordinator", f"localhost:{port}",
            "--num-processes", str(processes),
            "--process-id", str(pid),
            "--local-devices", str(local_devices),
            "--space", str(space),
            "--members", str(members_axis),
            "--dataset", dataset,
        ]
        if pid == 0:
            cmd += ["--out", out_path]
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    rcs, logs = [], []
    for p in procs:
        try:
            out_text, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out_text, _ = p.communicate()
            out_text += "\n[launcher] TIMEOUT"
        rcs.append(p.returncode)
        logs.append(out_text)
    if any(rc != 0 for rc in rcs) or not os.path.exists(out_path):
        for i, log in enumerate(logs):
            sys.stderr.write(f"--- worker {i} (rc={rcs[i]}) ---\n")
            sys.stderr.write((log or "")[-4000:] + "\n")
        raise SystemExit("multihost run failed")
    with open(out_path) as f:
        return json.loads(f.read())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--space", type=int, default=2)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--members-data", type=int, default=16,
                    help="ensemble size of the synthetic dataset")
    ap.add_argument("--zyx", default="32,48,48")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    zs, ys, xs = (int(v) for v in args.zyx.split(","))
    result = run(
        processes=args.processes, local_devices=args.local_devices,
        space=args.space, dataset=args.dataset, out=args.out,
        zs=zs, ys=ys, xs=xs, members_data=args.members_data)
    print(json.dumps(result))
    return 0 if result.get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Driver-contract test: ``python __graft_entry__.py 8`` with NO env help.

Round-1 failure mode (MULTICHIP_r01.json): the dryrun inherited the
axon TPU backend and died in ``jax.device_put`` on a libtpu AOT
mismatch.  The fix re-execs the dryrun in a subprocess with a forced
virtual CPU mesh; this test runs the entry file exactly the way the
driver does — bare invocation, no ``JAX_PLATFORMS``/``XLA_FLAGS``
assistance — so a regression shows up in CI, not in the round report.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_raw_invocation():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "_CORRTPU_DRYRUN_CHILD")
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"raw dryrun failed rc={proc.returncode}\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip(8) OK" in proc.stdout

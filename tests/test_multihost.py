"""2-process jax.distributed DP smoke test (VERDICT round-1 item #10).

Spawns two real processes, each with 2 virtual CPU devices, joined via
initialize_multihost into one 4-device mesh; each feeds its local_batch_slice
and runs one shard_mapped DP train step. Asserts both report the identical
global loss, matching a single-process 4-device run of the same step — the
multi-host path (jax.distributed + cross-process collectives +
make_array_from_process_local_data batch assembly) is *executed*, not just
written.

Skips (not fails) when the distributed CPU backend can't form a cluster in
this environment (sandboxed sockets etc.).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ,
               PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               JAX_NUM_CPU_DEVICES="2", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(_HERE, "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=720)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU cluster did not converge (timeout)")

    losses = []
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            low = out.lower()
            if ("distributed" in low and "unimplemented" in low) or \
                    "unavailable" in low or "deadline" in low:
                pytest.skip(f"jax.distributed unsupported here: {out[-400:]}")
            raise AssertionError(f"worker failed (rc={p.returncode}):\n{out}")
        m = re.search(r"LOSS ([0-9.eE+-]+)", out)
        assert m, f"no LOSS line in worker output:\n{out}"
        losses.append(float(m.group(1)))

    assert np.isfinite(losses).all(), losses
    # both processes see the same psum-allreduced global loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-9), losses

    # and it matches the identical 4-way DP step run inside this process
    # (same per-device shards, same math — only the process topology differs)
    from tests.multihost_common import make_global_batch, run_dp_step_over
    from yolov5m_tpu.parallel import make_mesh
    ref = run_dp_step_over(make_mesh(4), make_global_batch())
    assert losses[0] == pytest.approx(ref, abs=1e-5), (losses, ref)

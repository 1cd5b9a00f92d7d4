"""Worker process for the 2-process jax.distributed DP smoke test.

Usage: python multihost_worker.py <coordinator_port> <process_id>

Each of the 2 processes contributes 2 virtual CPU devices (4-device global
mesh), joins the cluster via initialize_multihost, feeds its local_batch_slice
of a deterministic global batch, and runs ONE data-parallel train step. It
prints "LOSS <value>" — the parent test asserts both processes report the
same, finite loss, equal to a single-process 4-device run of the same step.
"""

import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])

    import os

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    # persistent compile cache: the dp_step CPU compile is minutes cold; the
    # first run warms .jax_cache and later runs (and the peer process) reuse it
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from yolov5m_tpu.parallel import initialize_multihost
    initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2, jax.local_devices()

    from tests.multihost_common import run_dp_step_over, make_global_batch
    from yolov5m_tpu.parallel import local_batch_slice, make_mesh

    mesh = make_mesh()  # all 4 devices across both processes
    batch = make_global_batch()
    sl = local_batch_slice(batch["image"].shape[0])
    local = {k: np.asarray(v)[sl] for k, v in batch.items()}

    def barrier():
        # coordination-service barrier (NOT a Gloo collective): aligns the
        # processes after their multi-minute, unsynchronized compiles so the
        # 30s Gloo rendezvous at first execution can't time out
        from jax._src.distributed import global_state
        print("at barrier", flush=True)
        global_state.client.wait_at_barrier("dp_step_compiled",
                                            timeout_in_ms=15 * 60 * 1000)

    loss = run_dp_step_over(mesh, local, barrier=barrier)
    print(f"LOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()

"""Data-parallel training over a jax.sharding.Mesh.

The reference is strictly single-device (no torch.distributed / NCCL / DP
anywhere — SURVEY.md §2); this module adds the multi-chip data-parallel
configuration the north star requires (BASELINE.json configs[4]):

  * 1-D device mesh with axis "data";
  * per-device batch shards (batch axis sharded over "data");
  * replicated TrainState; gradients psum-allreduced over ICI inside the
    shard_mapped train step (see train/trainer.py pmean_axis);
  * BatchNorm runs on local per-device statistics (matching the reference's
    single-device BN semantics at equal per-device batch), with running
    buffers pmean-synced so replicas never diverge.

Multi-host: call jax.distributed.initialize() before make_mesh and the same
code runs over DCN+ICI; collectives are laid out by XLA along the mesh.

DP is the WORKHORSE axis for this workload (a CNN detector with ~21M params
fits one chip's HBM, so scaling out over the batch is the natural move and
what the north star measures). The sibling modules cover the rest of the
matrix for the regimes DP can't reach: sp.py (spatial partitioning — batch
smaller than the mesh / large canvases), tp.py (channel sharding — widths
past one chip), pp.py (pipeline + DPxPP composition); EP stays n/a (no
routed experts in this architecture, SURVEY.md §2).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolov5m_tpu.train.trainer import TrainState, make_train_step


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Join a multi-host JAX cluster (DCN between hosts, ICI within).

    Call once before make_mesh on every host; afterwards jax.devices() spans
    all hosts and the same shard_map DP code runs unchanged (collectives are
    laid out over ICI/DCN by XLA). With no arguments, cluster autodetection
    (TPU pod environments) is used. Returns this process's index.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    elif num_processes is not None or process_id is not None:
        # an explicit topology without a coordinator would be silently
        # DROPPED below (autodetect mode ignores it) — the caller's stated
        # intent must not degrade into autodetected identity
        raise ValueError(
            "num_processes/process_id require coordinator_address; pass all "
            "three, or none for cluster autodetection")
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_mesh2d(n_major: int, n_minor: int, major_axis: str,
                minor_axis: str) -> Mesh:
    """Shared 2-D mesh builder behind make_sp_mesh / make_tp_mesh /
    make_dp_pp_mesh (each fronts it with its domain's axis names).

    The minor axis is the fastest-varying dimension, so that axis's
    per-layer / per-tick collectives (halo exchanges, channel gathers,
    pipeline ppermutes) ride nearest-neighbor ICI links under the default
    device enumeration; the major axis carries only per-step reductions.
    """
    n = n_major * n_minor
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_major, n_minor)
    return Mesh(grid, (major_axis, minor_axis))


def resolve_data_axis(data_axis: Optional[str], mesh: Mesh,
                      reserved: tuple = ()) -> Optional[str]:
    """Validate an optional batch-sharding axis against the mesh.

    The DEFAULT name "data" degrades to None on a 1-D mesh without it (the
    documented convenience for pure-SP/TP meshes); any other miss is
    treated as a typo/renamed-axis mistake and raises — silently
    replicating the batch would deliver 1/n_data of the expected
    throughput with no diagnostic (every data-row of chips redundantly
    computing the full batch). `reserved` names compute axes the batch
    must not alias (e.g. PP's pipe axis: sharding the batch over it would
    feed each pipeline stage a different batch slice and silently corrupt
    results)."""
    if data_axis is not None and data_axis in reserved:
        raise ValueError(
            f"data_axis {data_axis!r} is this mesh's compute axis; "
            f"sharding the batch over it would corrupt results")
    if data_axis is None or data_axis in mesh.axis_names:
        return data_axis
    if data_axis == "data" and len(mesh.axis_names) == 1:
        return None
    raise ValueError(
        f"data_axis {data_axis!r} is not one of this mesh's axes "
        f"{mesh.axis_names}; pass None to replicate the batch instead")


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # never truncate silently: the caller sized batches/throughput
            # expectations to n_devices
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available ({devices})")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def local_batch_slice(global_batch_size: int) -> slice:
    """The slice of the global batch this host should feed (multi-host DP:
    each host loads only its shard; device_put then places per-device)."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        # never truncate silently (same stance as make_mesh): flooring the
        # per-host share would drop the remainder rows while the caller
        # sized loss scaling and throughput to the full global batch
        raise ValueError(
            f"global batch {global_batch_size} is not divisible by the "
            f"{n_proc} participating hosts")
    per = global_batch_size // n_proc
    start = jax.process_index() * per
    return slice(start, start + per)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the TrainState fully-replicated on every mesh device.

    Multi-host: every process holds the identical full value (same init
    seed / same checkpoint), so the host-local value IS the global value and
    assembles directly onto the process-spanning sharding."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), state)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Shard the leading (batch) axis of every array over the mesh.

    Multi-host: each process passes only its local shard of the global batch
    (see local_batch_slice); the global array is assembled across processes
    without any cross-host data movement."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v)) for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def make_dp_train_step(model, loss_fn, optimizer, mesh: Mesh,
                       accumulate: int = 1, axis: str = "data",
                       donate: bool = False, flat: bool = False) -> Callable:
    """shard_mapped + jitted DP train step.

    The mesh size must divide the global batch (each device takes
    batch/mesh_size rows). Losses/grads are psum-summed
    over devices, so the update equals a single-device step on the full
    global batch (the reference's accumulation semantics, scaled out).

    donate=True donates the input TrainState buffers to the step (the caller
    must rebind, as a training loop does): the ~6 param-sized state arrays
    (params, 2x Adam moments, accum grads, EMA) update in place instead of
    allocating fresh HBM each step.
    """
    step_fn = make_train_step(model, loss_fn, optimizer,
                              accumulate=accumulate, pmean_axis=axis,
                              flat=flat)

    # check_vma=True (replication tracking) is REQUIRED for correct AD here:
    # without it the transpose of the loss's internal psums conservatively
    # psums the cotangents too, inflating gradients by the mesh size.
    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=True,
    )

    donate_kw = {"donate_argnums": (0,)} if donate else {}

    @functools.partial(jax.jit, **donate_kw)
    def dp_step(state: TrainState, image, labels, mask):
        return sharded(state, image, labels, mask)

    return dp_step

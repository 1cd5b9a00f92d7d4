"""Guard-rail behavior of the parallel package's mesh/axis plumbing.

These pins exist because every failure mode here is SILENT on real
hardware: a typo'd data_axis used to degrade to None (batch replicated —
1/n_data of the expected throughput, results still correct, no
diagnostic), a batch aliased onto PP's pipe axis feeds each pipeline
stage a different batch slice, and a non-divisible multi-host batch
dropped its remainder rows. The reference has no parallelism at all
(SURVEY.md §2), so there is no reference analog to cite.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from yolov5m_tpu.parallel import (
    make_dp_pp_mesh, make_sp_mesh, make_tp_mesh)
from yolov5m_tpu.parallel.dp import (
    initialize_multihost, local_batch_slice, make_mesh2d, resolve_data_axis)


def test_mesh_builders_share_layout():
    """sp/tp/dp-pp meshes all come from make_mesh2d: major axis first,
    minor (collective-heavy) axis fastest-varying."""
    for mesh, names in ((make_sp_mesh(4, 2), ("data", "spatial")),
                        (make_tp_mesh(2, 4), ("data", "model")),
                        (make_dp_pp_mesh(4, 2), ("data", "pipe"))):
        assert mesh.axis_names == names
        # minor axis fastest-varying: consecutive devices share a major row
        grid = mesh.devices
        assert grid.shape == (mesh.shape[names[0]], mesh.shape[names[1]])
        flat = [d.id for d in grid.flatten()]
        assert flat == sorted(flat)


def test_mesh2d_rejects_too_few_devices():
    with pytest.raises(ValueError, match="need"):
        make_mesh2d(8, 8, "a", "b")


def test_resolve_data_axis_contract():
    mesh2 = make_sp_mesh(4, 2)
    assert resolve_data_axis("data", mesh2) == "data"
    assert resolve_data_axis(None, mesh2) is None
    # default name degrades ONLY on a 1-D mesh (pure-SP/TP convenience)
    mesh1 = Mesh(np.asarray(jax.devices()[:2]), ("spatial",))
    assert resolve_data_axis("data", mesh1) is None
    # a typo'd axis raises instead of silently replicating the batch
    with pytest.raises(ValueError, match="not one of this mesh's axes"):
        resolve_data_axis("batch", mesh2)
    # ... and so does the default name on a renamed 2-D mesh
    with pytest.raises(ValueError, match="not one of this mesh's axes"):
        resolve_data_axis("data", make_mesh2d(2, 2, "batch", "spatial"))
    # aliasing a reserved compute axis is rejected (PP's pipe axis)
    with pytest.raises(ValueError, match="compute axis"):
        resolve_data_axis("pipe", make_dp_pp_mesh(4, 2), reserved=("pipe",))


def test_pp_entry_points_reject_bad_data_axis():
    from yolov5m_tpu.config import ANCHORS, Config
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.parallel import make_pp_train_step
    from yolov5m_tpu.train import LossConfig, YoloLoss
    from yolov5m_tpu.train.trainer import make_optimizer

    cfg = Config(first_out=4, nc=2, image_size=64)
    model = YOLOv5(first_out=4, nc=2)
    loss_fn = YoloLoss(LossConfig(nc=2, image_size=64),
                       np.asarray(ANCHORS, np.float32))
    opt = make_optimizer(cfg)
    mesh = make_dp_pp_mesh(4, 2)
    with pytest.raises(ValueError, match="compute axis"):
        make_pp_train_step(model, loss_fn, opt, mesh, microbatch=1,
                           num_microbatches=2, image_hw=(64, 64),
                           data_axis="pipe")
    with pytest.raises(ValueError, match="not one of this mesh's axes"):
        make_pp_train_step(model, loss_fn, opt, mesh, microbatch=1,
                           num_microbatches=2, image_hw=(64, 64),
                           data_axis="dta")


def test_local_batch_slice_single_process():
    assert local_batch_slice(64) == slice(0, 64)
    # divisibility guard: jax.process_count() is 1 in tests, so exercise
    # the check through the public error path via monkeypatched count
    import yolov5m_tpu.parallel.dp as dp

    orig = jax.process_count
    try:
        jax.process_count = lambda: 3
        with pytest.raises(ValueError, match="not divisible"):
            dp.local_batch_slice(64)
    finally:
        jax.process_count = orig


def test_initialize_multihost_rejects_partial_topology():
    with pytest.raises(ValueError, match="coordinator_address"):
        initialize_multihost(num_processes=2)
    with pytest.raises(ValueError, match="coordinator_address"):
        initialize_multihost(process_id=0)

"""Pipeline-parallel execution (parallel/pp.py) on the virtual CPU mesh.

PP runs the SAME ops in the SAME order as the single-device graph — pack/
unpack of the carry buffer is exact reshaping and ppermute moves bits —
so unlike the SP/TP tests (which tolerate reduction-order noise from
split reductions) the parity here is tight: the staged forward must
reproduce the monolithic forward to float32 round-off, and one PP train
step must match M sequential single-device calls at accumulate=M
(identical per-micro-batch BN running-stat order, summed grads, one
clip→Adam→EMA application).
"""

import numpy as np
import jax
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect
from yolov5m_tpu.parallel import (
    make_pp_infer_fn, make_pp_mesh, make_pp_train_step)
from yolov5m_tpu.parallel.pp import N_STEPS, StagePlan, _STEPS
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import (
    create_train_state, make_optimizer, make_train_step)

NC = 4
HW = 128


def _model(**kw):
    model = YOLOv5(first_out=8, nc=NC, dtype=jnp.float32, **kw)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3), jnp.float32))
    return model, variables


def test_stage_plan_liveness_and_packing():
    """Cuts (4, 8, 13): the P3 tap (produced at step 4) must ride the
    carry across boundaries 1 and 2 to its consumer at step 13; the
    pack/unpack round-trip is exact."""
    model, variables = _model()
    plan = StagePlan(model, variables, (2, HW, HW, 3), 4, cuts=(4, 8, 13))
    assert plan.live[0] == ["x4"]
    assert plan.live[1] == ["p3", "p4", "x8"]
    assert plan.live[2] == ["p3", "s20", "s40"]
    assert [len(s) for s in plan.stage_steps] == [4, 4, 5, 6]
    assert sum(len(s) for s in plan.stage_steps) == N_STEPS

    rng = np.random.default_rng(0)
    vals = {n: jnp.asarray(rng.normal(size=plan.value_shapes[n])
                           .astype(np.float32))
            for n in plan.live[1]}
    buf = plan.pack(vals, 1)
    assert buf.shape == (2, plan.buf_len)
    back = plan.unpack(buf, 1)
    for n in plan.live[1]:
        np.testing.assert_array_equal(np.asarray(back[n]),
                                      np.asarray(vals[n]))


def test_program_matches_monolithic_forward(rng):
    """The linearized step program reproduces YOLOv5.__call__ exactly."""
    model, variables = _model()
    x = jnp.asarray(rng.uniform(0, 1, (2, HW, HW, 3)).astype(np.float32))

    def run_all(m, x):
        vals = {"x0": x.astype(model.dtype)}
        for name, _, _, fn in _STEPS:
            vals[name] = fn(m, vals, False)
        return vals["out"]

    staged = model.apply(variables, x, method=run_all)
    mono = model.apply(variables, x, train=False)
    for a, b in zip(staged, mono):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_infer_matches_single_device(rng):
    """4-stage pipeline, 2 micro-batches of 2: detections equal the
    single-device fused pipeline (per-image postprocess)."""
    model, variables = _model()
    fused, fvars = model.clone(fused=True), fold_batchnorm(variables)
    mesh = make_pp_mesh(n_pipe=4)
    kw = dict(conf_threshold=0.01, iou_threshold=0.45,
              max_detections=32, pre_nms_topk=64)
    infer = make_pp_infer_fn(fused, fvars, normalized_anchors(), mesh,
                             microbatch=2, num_microbatches=2,
                             image_hw=(HW, HW), **kw)

    images = rng.uniform(0, 1, (4, HW, HW, 3)).astype(np.float32)
    det_pp, valid_pp = jax.device_get(infer(jnp.asarray(images)))

    preds = fused.apply(fvars, jnp.asarray(images), train=False)
    det_1, valid_1 = jax.device_get(fused_detect(
        preds, jnp.asarray(normalized_anchors()), **kw))

    np.testing.assert_array_equal(valid_pp, valid_1)
    np.testing.assert_allclose(det_pp[valid_pp], det_1[valid_1],
                               rtol=1e-5, atol=1e-5)
    assert valid_pp.any(), "degenerate test: no detections survived"


def test_pp_train_step_matches_sequential_accumulate(rng):
    """One PP call (M=2 micro-batches through S=4 stages) equals two
    sequential single-device calls at accumulate=2: params, EMA, BN
    running stats, and Adam moments all match."""
    mb, M = 2, 2
    cfg = Config(first_out=8, nc=NC, image_size=HW, batch_size=mb,
                 compute_dtype="float32")
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.float32)
    loss_fn = YoloLoss(LossConfig(nc=NC, image_size=HW),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)

    def fresh_state():
        return create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  (HW, HW), optimizer)

    images = rng.uniform(0, 1, (M * mb, HW, HW, 3)).astype(np.float32)
    labels = np.zeros((M * mb, 8, 5), np.float32)
    labels[:, 0] = [1, 0.4, 0.6, 0.3, 0.2]
    labels[:, 1] = [2, 0.7, 0.3, 0.2, 0.4]
    mask = np.zeros((M * mb, 8), bool)
    mask[:, :2] = True
    images, labels, mask = map(jnp.asarray, (images, labels, mask))

    # reference: M sequential micro-calls, optimizer fires on the last
    ref_step = jax.jit(make_train_step(model, loss_fn, optimizer,
                                       accumulate=M))
    ref_state = fresh_state()
    for m in range(M):
        sl = slice(m * mb, (m + 1) * mb)
        ref_state, ref_metrics = ref_step(ref_state, images[sl],
                                          labels[sl], mask[sl])

    mesh = make_pp_mesh(n_pipe=4)
    pp_step = make_pp_train_step(model, loss_fn, optimizer, mesh,
                                 microbatch=mb, num_microbatches=M,
                                 image_hw=(HW, HW), donate=False)
    pp_state, pp_metrics = pp_step(fresh_state(), images, labels, mask)

    assert int(pp_state.step) == int(ref_state.step) == M
    for field in ("params", "ema_params", "batch_stats"):
        fa = jax.tree.leaves(jax.device_get(getattr(pp_state, field)))
        fb = jax.tree.leaves(jax.device_get(getattr(ref_state, field)))
        assert len(fa) == len(fb)
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5, rtol=1e-5)
    # Adam moments store RAW per-step gradients, where XLA codegen
    # differences between the scanned pipeline program and the two plain
    # jitted reference calls surface as f32 reduction-order noise through
    # the BN-statistics backward (repo noise model: tests/test_sp_train.py
    # module docstring; this exact fragility at atol=1e-6 was flagged
    # portable-red by the round-4 review). Compare at the noise scale:
    # moments are O(grad); bound the absolute delta well below any real
    # semantic divergence but above cross-host codegen jitter.
    ma = jax.tree.leaves(jax.device_get(pp_state.opt_state))
    mr = jax.tree.leaves(jax.device_get(ref_state.opt_state))
    for x, y in zip(ma, mr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-4, rtol=1e-3)
    assert np.isfinite(float(pp_metrics["loss"]))


def test_dp_pp_train_matches_dp_accumulate(rng):
    """DPxPP (2 data replicas x 4 pipeline stages on the 8-device mesh)
    equals the DP-of-accumulate=M baseline: M sequential DP calls, each on
    one micro-batch sharded over the same 2 data replicas. Params, EMA,
    BN running stats (pmean-synced over data in both paths), and Adam
    moments must all match.

    Valid-box counts VARY across images (and hence across data shards):
    per-shard masked-mean losses do not commute with the cross-replica sum
    when counts differ, so this pins that DPxPP composes the global
    numerator/denominator sums (the exact DP semantics), not a sum of
    local means.

    Tolerances: the DPxPP program and the DP baseline are DIFFERENT
    compiled programs on different meshes, so f32 reduction-order noise
    through the BN-statistics backward perturbs raw gradients, and Adam's
    g/(sqrt(v)+eps) normalization turns a near-zero-grad sign flip into a
    +-lr param delta (repo noise model: tests/test_sp_train.py docstring;
    round-4 review measured 1/32768 elements at 1.9e-5 on a different
    host at the old atol=1e-5). Params/EMA/BN are therefore bounded at
    the documented +-2*lr scale (atol 2.1e-3, same as the SP/DP tests);
    raw Adam moments are NOT element-compared (CLAUDE.md session-4 rule)
    — their scale is pinned by a norm check. Semantic exactness of the
    composition is pinned elsewhere: pure num/den compose bit-exactly in
    test_loss.py, the staged forward is bit-exact in
    test_program_matches_monolithic_forward, and SP's f64 proof covers
    the BN-backward noise mechanism."""
    from yolov5m_tpu.parallel import (make_dp_pp_mesh, make_dp_train_step,
                                      make_mesh, replicate_state,
                                      shard_batch)
    from yolov5m_tpu.parallel.pp import make_pp_train_step as mk_pp

    D, S, mb, M = 2, 4, 2, 2
    cfg = Config(first_out=8, nc=NC, image_size=HW, batch_size=D * mb,
                 compute_dtype="float32")
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.float32)
    loss_fn = YoloLoss(LossConfig(nc=NC, image_size=HW),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)

    def fresh_state():
        return create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  (HW, HW), optimizer)

    n = M * D * mb
    images = rng.uniform(0, 1, (n, HW, HW, 3)).astype(np.float32)
    labels = np.zeros((n, 8, 5), np.float32)
    mask = np.zeros((n, 8), bool)
    for b in range(n):  # uneven counts across shards (see docstring)
        k = int(rng.integers(1, 8))
        labels[b, :k, 0] = rng.integers(0, NC, k)
        labels[b, :k, 1:3] = rng.uniform(0.2, 0.8, (k, 2))
        labels[b, :k, 3:5] = rng.uniform(0.05, 0.3, (k, 2))
        mask[b, :k] = True

    # baseline: M sequential DP(accumulate=M) calls on 2 data devices,
    # micro-batch m = global rows [m*D*mb, (m+1)*D*mb) sharded over data
    dp_mesh = make_mesh(D)
    dp_step = make_dp_train_step(model, loss_fn, optimizer, dp_mesh,
                                 accumulate=M)
    ref_state = replicate_state(fresh_state(), dp_mesh)
    for m in range(M):
        sl = slice(m * D * mb, (m + 1) * D * mb)
        b = shard_batch({"image": images[sl], "labels": labels[sl],
                         "mask": mask[sl]}, dp_mesh)
        ref_state, _ = dp_step(ref_state, b["image"], b["labels"],
                               b["mask"])

    mesh = make_dp_pp_mesh(n_data=D, n_pipe=S)
    pp_step = mk_pp(model, loss_fn, optimizer, mesh, microbatch=mb,
                    num_microbatches=M, image_hw=(HW, HW), donate=False,
                    data_axis="data")
    pp_state, pp_metrics = pp_step(fresh_state(), jnp.asarray(images),
                                   jnp.asarray(labels), jnp.asarray(mask))

    assert int(pp_state.step) == int(ref_state.step) == M
    for field in ("params", "ema_params", "batch_stats"):
        fa = jax.tree.leaves(jax.device_get(getattr(pp_state, field)))
        fb = jax.tree.leaves(jax.device_get(getattr(ref_state, field)))
        assert len(fa) == len(fb)
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=2.1e-3, rtol=1e-4)
    # Adam moments: scale check only (see docstring — raw moments carry
    # reduction-order noise; element compare is not host-portable)
    ma = jax.tree.leaves(jax.device_get(pp_state.opt_state))
    mr = jax.tree.leaves(jax.device_get(ref_state.opt_state))
    assert len(ma) == len(mr)
    for x, y in zip(ma, mr):
        nx = float(np.linalg.norm(np.asarray(x, np.float64).ravel()))
        ny = float(np.linalg.norm(np.asarray(y, np.float64).ravel()))
        np.testing.assert_allclose(nx, ny, rtol=1e-3, atol=1e-6)
    assert np.isfinite(float(pp_metrics["loss"]))


def test_dp_pp_infer_matches_single_device(rng):
    """DPxPP inference on the (2, 4) mesh: detections equal the
    single-device fused pipeline, rows in input order."""
    from yolov5m_tpu.parallel import make_dp_pp_mesh

    model, variables = _model()
    fused, fvars = model.clone(fused=True), fold_batchnorm(variables)
    mesh = make_dp_pp_mesh(n_data=2, n_pipe=4)
    kw = dict(conf_threshold=0.01, iou_threshold=0.45,
              max_detections=32, pre_nms_topk=64)
    infer = make_pp_infer_fn(fused, fvars, normalized_anchors(), mesh,
                             microbatch=1, num_microbatches=2,
                             image_hw=(HW, HW), data_axis="data", **kw)

    images = rng.uniform(0, 1, (4, HW, HW, 3)).astype(np.float32)
    det_pp, valid_pp = jax.device_get(infer(jnp.asarray(images)))

    preds = fused.apply(fvars, jnp.asarray(images), train=False)
    det_1, valid_1 = jax.device_get(fused_detect(
        preds, jnp.asarray(normalized_anchors()), **kw))

    np.testing.assert_array_equal(valid_pp, valid_1)
    np.testing.assert_allclose(det_pp[valid_pp], det_1[valid_1],
                               rtol=1e-5, atol=1e-5)
    assert valid_pp.any(), "degenerate test: no detections survived"


def test_pp_train_composes_with_remat(rng):
    """remat=True (the GPipe stash→recompute trade) is a jaxpr-level
    identity, but XLA may fuse the recomputed segments differently under
    the scanned/switched pipeline, so gradients can differ in the last
    bit and Adam's g/(sqrt(v)+eps) normalization amplifies that at init
    (observed: 2/73k params off by ≤2.2e-5). Bound the param delta at
    1e-4 = lr/5 — far below any real divergence, far above fusion noise."""
    mb, M = 2, 2
    cfg = Config(first_out=8, nc=NC, image_size=HW, batch_size=mb,
                 compute_dtype="float32")
    loss_fn = YoloLoss(LossConfig(nc=NC, image_size=HW),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)
    mesh = make_pp_mesh(n_pipe=2)

    images = jnp.asarray(rng.uniform(0, 1, (M * mb, HW, HW, 3))
                         .astype(np.float32))
    labels = np.zeros((M * mb, 8, 5), np.float32)
    labels[:, 0] = [1, 0.4, 0.6, 0.3, 0.2]
    mask = np.zeros((M * mb, 8), bool)
    mask[:, 0] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)

    states = {}
    for remat in (False, True):
        model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc,
                       dtype=jnp.float32, remat=remat)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (HW, HW), optimizer)
        step = make_pp_train_step(model, loss_fn, optimizer, mesh,
                                  microbatch=mb, num_microbatches=M,
                                  image_hw=(HW, HW), donate=False)
        states[remat], _ = step(state, images, labels, mask)

    pa = jax.tree.leaves(jax.device_get(states[False].params))
    pb = jax.tree.leaves(jax.device_get(states[True].params))
    for x, y in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-4, rtol=0)

"""Pipeline-parallel (PP) execution: model STAGES over a mesh axis.

The last axis of the parallelism matrix. DP (parallel/dp.py) shards the
batch, SP (parallel/sp.py) the image rows, TP (parallel/tp.py) the
channels — all three are GSPMD shardings of one logical step, because the
partitioner can split *space* (batch, rows, channels) on its own. PP is
different in kind: it splits *time*. The 19-step YOLO graph is cut into S
contiguous stages, each device runs one stage, and M micro-batches stream
through the stages GPipe-style — device s works on micro-batch m while
device s+1 works on m-1. GSPMD cannot express that schedule, so this is
the one module where explicit collective choreography (lax.ppermute of
activations between neighbor stages) IS the design, built the TPU-native
way: ONE jit containing a lax.scan over the M+S-1 pipeline ticks, a
lax.switch on the device's stage id, and static pack/unpack of every
inter-stage activation into a fixed carry buffer so the whole pipeline
has a single static shape for XLA.

Training comes from plain AD: jax.grad through the scanned, ppermuted
forward yields the reverse pipeline automatically (the transpose of
ppermute is the reverse ppermute; the transpose of the replicated-param
broadcast is the cross-stage psum of gradients), i.e. the GPipe
fwd-all-then-bwd-all schedule with the scan's residuals as the
activation stash. One PP call with M micro-batches is NUMERICALLY
IDENTICAL to M sequential single-device calls of the standard train step
at accumulate=M (tests/test_pp.py): per-micro-batch BatchNorm running-
stat updates land in the same order (stage s processes micro-batch m
strictly after m-1), gradients are summed over micro-batches by AD
through the scan, and the clip → Adam → EMA epilogue fires once on the
sum, exactly like the firing call of the accumulate path
(trainer.py:244-264).

AD-correctness note (the dp.py:119 lesson, inverted): this module runs
shard_map with check_vma=False, so every internal lax.psum would have a
conservative psum transpose — on a replicated cotangent that inflates
gradients by the mesh size. The differentiated path therefore crosses
the shard_map boundary UN-reduced: each device returns its local
masked-mean NUMERATORS and DENOMINATORS per micro-batch (YoloLoss.
num_den, (M, nl) per loss part), and the cross-device sum + the
num/den division happen OUTSIDE shard_map where AD is trivially exact.
Summing num and den separately before dividing is also what makes DPxPP
exact: per-shard masked MEANS do not commute with summation when
valid-box counts differ across data shards, num/den pairs do. The only
internal psum (BN-stat ownership merge) sits on the aux path, which
value_and_grad(has_aux=True) never differentiates.

Skip connections (the P3/P4 taps consumed 9 and 4 modules later, the
neck's stash pair) are handled by LIVENESS, not special cases: the graph
is a linear program over named values (_STEPS below); whatever is
produced before a cut and read after it rides the carry buffer through
the intervening stages. Cut positions are a tuning knob (`cuts`).

Honest production guidance: for THIS workload — a 21M-param CNN whose
whole TrainState fits one chip with room to spare — PP is strictly worse
than DP: the pipeline bubble idles (S-1)/(M+S-1) of the ticks, stage
costs are uneven (the 160² early convs dominate), and the inter-stage
activations are ppermuted over ICI where DP moves nothing — at 640² the
widest carry (the boundary where the p3/p4 taps ride alongside the
trunk: 80²·192 + 2·40²·384) is ≈2.5M elements/image = 4.9 MB bf16 per
tick (sizes from StagePlan.buf_len; only one physical chip is reachable
here, so PP is validated on the virtual mesh, not timed on real ICI).
Use PP when a model's
layers do NOT fit one chip and channels alone can't split them, or
compose it with DP for the very large family variants: pass a 2-D
(data, pipe) mesh (make_dp_pp_mesh) plus data_axis to
make_pp_train_step/make_pp_infer_fn — DP replicas each run the pipeline
on their batch shard, gradients allreduce over "data", equivalence to
the DP-of-accumulate=M baseline pinned in tests/test_pp.py. The
reference is single-GPU torch with no equivalent (SURVEY.md §2); the
staged graph mirrors reference model.py:178-239 op for op.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolov5m_tpu.models.blocks import upsample2x_nearest


# ---------------------------------------------------------------------------
# The forward as a linear program over named values.
#
# Each step: (value_name, reads, flax_module_key, fn(module, vals, train)).
# This is models/yolo.py:__call__ linearized — same modules, same order,
# same concat operands — so a staged execution is op-for-op identical to
# the monolithic forward. "out" (the head tuple) is produced by the last
# step and never crosses a stage boundary.
# ---------------------------------------------------------------------------

def _program():
    steps = []

    def add(name, reads, module, fn):
        steps.append((name, tuple(reads), module, fn))

    def bb(i, rd):
        return lambda m, v, tr: m.backbone[i](v[rd], tr)

    def nk(i, rd):
        return lambda m, v, tr: m.neck[i](v[rd], tr)

    def nk_upcat(i, small, skip):
        # FPN joins (neck 0→1, 2→3): 2x nearest upsample of the stashed
        # 1x1 output, concatenated with the backbone tap (yolo.py:155-159)
        return lambda m, v, tr: m.neck[i](jnp.concatenate(
            [upsample2x_nearest(v[small]), v[skip]], axis=-1), tr)

    def nk_cat(i, a, b):
        # PAN down joins (neck 4→5, 6→7) — yolo.py:160-162
        return lambda m, v, tr: m.neck[i](jnp.concatenate(
            [v[a], v[b]], axis=-1), tr)

    add("x1", ["x0"], "backbone_0", bb(0, "x0"))
    add("x2", ["x1"], "backbone_1", bb(1, "x1"))
    add("x3", ["x2"], "backbone_2", bb(2, "x2"))
    add("x4", ["x3"], "backbone_3", bb(3, "x3"))
    add("p3", ["x4"], "backbone_4", bb(4, "x4"))       # tap (yolo.py:149)
    add("x6", ["p3"], "backbone_5", bb(5, "p3"))
    add("p4", ["x6"], "backbone_6", bb(6, "x6"))       # tap
    add("x8", ["p4"], "backbone_7", bb(7, "p4"))
    add("x9", ["x8"], "backbone_8", bb(8, "x8"))
    add("x10", ["x9"], "backbone_9", bb(9, "x9"))      # SPPF
    add("s20", ["x10"], "neck_0", nk(0, "x10"))        # stash
    add("x12", ["s20", "p4"], "neck_1", nk_upcat(1, "s20", "p4"))
    add("s40", ["x12"], "neck_2", nk(2, "x12"))        # stash
    add("f80", ["s40", "p3"], "neck_3", nk_upcat(3, "s40", "p3"))
    add("x14", ["f80"], "neck_4", nk(4, "f80"))
    add("f40", ["x14", "s40"], "neck_5", nk_cat(5, "x14", "s40"))
    add("x16", ["f40"], "neck_6", nk(6, "f40"))
    add("f20", ["x16", "s20"], "neck_7", nk_cat(7, "x16", "s20"))
    add("out", ["f80", "f40", "f20"], "head",
        lambda m, v, tr: tuple(m.head([v["f80"], v["f40"], v["f20"]])))
    return steps


_STEPS = _program()
N_STEPS = len(_STEPS)

# Default cuts (stage boundaries as step indices) per stage count. Balance
# is a tuning knob, not a correctness property — these split the m-variant
# roughly evenly by cost (the high-resolution early convs are heavy, so
# stage 0 gets fewer steps than an even step split would give it).
DEFAULT_CUTS = {
    2: (7,),
    4: (4, 8, 13),
    8: (2, 4, 6, 8, 11, 13, 16),
}


class StagePlan:
    """Static plan: steps per stage, live values at each stage boundary,
    and the pack/unpack layout of the fixed inter-stage carry buffer.

    `variables` may be real arrays or ShapeDtypeStructs — only shapes are
    used (everything goes through jax.eval_shape)."""

    def __init__(self, model, variables, image_shape: Tuple[int, ...],
                 n_stages: int, cuts: Optional[Sequence[int]] = None):
        assert not getattr(model, "stem_s2d", False), \
            "PP does not support the s2d stem rewrite (default-off)"
        assert not getattr(model, "quant", False), \
            "PP pipelines the float graph; int8 PTQ is single-device"
        if cuts is None:
            cuts = DEFAULT_CUTS.get(n_stages) or tuple(
                round(N_STEPS * i / n_stages) for i in range(1, n_stages))
        cuts = tuple(cuts)
        assert len(cuts) == n_stages - 1, \
            f"{n_stages} stages need {n_stages - 1} cuts, got {cuts}"
        assert all(0 < c < N_STEPS for c in cuts)
        assert tuple(sorted(set(cuts))) == cuts, f"cuts must increase: {cuts}"
        bounds = (0,) + cuts + (N_STEPS,)
        self.n_stages = n_stages
        self.stage_steps = [list(range(bounds[b], bounds[b + 1]))
                            for b in range(n_stages)]

        # value shapes: one eval_shape of the full linearized forward
        def run_all(m, x):
            vals = {"x0": x.astype(model.dtype)}
            for name, _, _, fn in _STEPS:
                vals[name] = fn(m, vals, False)
            return {k: v for k, v in vals.items() if k != "out"}, vals["out"]

        shapes, out_shapes = jax.eval_shape(
            lambda v, x: model.apply(v, x, method=run_all),
            variables, jax.ShapeDtypeStruct(image_shape, jnp.float32))
        self.value_shapes = {k: tuple(s.shape) for k, s in shapes.items()}
        self.value_dtype = shapes["x1"].dtype
        self.out_shapes = out_shapes
        self.mb = image_shape[0]

        # liveness at each cut: produced before it, read at/after it
        produced_at = {name: i for i, (name, _, _, _) in enumerate(_STEPS)}
        self.live = []           # live[b] = names crossing boundary b→b+1
        for c in cuts:
            alive = set()
            for i in range(c, N_STEPS):
                for r in _STEPS[i][1]:
                    if r != "x0" and produced_at[r] < c:
                        alive.add(r)
            self.live.append(sorted(alive))

        def slot_len(name):
            return int(np.prod(self.value_shapes[name][1:]))

        self.buf_len = max((sum(slot_len(n) for n in names)
                            for names in self.live), default=1) or 1

        # flax module key → owning stage (for the BN-stat ownership merge)
        self.module_stage = {}
        for b, idxs in enumerate(self.stage_steps):
            for i in idxs:
                self.module_stage[_STEPS[i][2]] = b

    def pack(self, vals: Dict[str, jnp.ndarray], boundary: int):
        """Flatten boundary `boundary`'s live set into (mb, buf_len)."""
        names = self.live[boundary]
        flat = [vals[n].reshape(self.mb, -1).astype(self.value_dtype)
                for n in names]
        buf = (jnp.concatenate(flat, axis=-1) if flat
               else jnp.zeros((self.mb, 0), self.value_dtype))
        pad = self.buf_len - buf.shape[-1]
        return jnp.pad(buf, ((0, 0), (0, pad))) if pad else buf

    def unpack(self, buf: jnp.ndarray, boundary: int):
        vals, off = {}, 0
        for n in self.live[boundary]:
            shape = self.value_shapes[n]
            ln = int(np.prod(shape[1:]))
            vals[n] = buf[:, off:off + ln].reshape(shape)
            off += ln
        return vals


def make_pp_mesh(n_pipe: int = 4, pipe_axis: str = "pipe") -> Mesh:
    """A 1-D pipeline mesh over the first n_pipe devices. Stage s+1 sits
    on the device after stage s, so the per-tick activation ppermute rides
    nearest-neighbor ICI links under the default device enumeration."""
    devices = jax.devices()
    if len(devices) < n_pipe:
        raise ValueError(f"need {n_pipe} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_pipe]), (pipe_axis,))


def make_dp_pp_mesh(n_data: int = 2, n_pipe: int = 4,
                    data_axis: str = "data",
                    pipe_axis: str = "pipe") -> Mesh:
    """A 2-D (data, pipe) mesh: n_data replicas, each running an n_pipe-
    stage pipeline — the standard large-model composition (DP outermost).
    The pipe axis is minor (fastest-varying), so each replica's per-tick
    activation ppermute rides nearest-neighbor ICI links; the data axis
    carries only the per-step gradient allreduce."""
    from yolov5m_tpu.parallel.dp import make_mesh2d
    return make_mesh2d(n_data, n_pipe, data_axis, pipe_axis)


def _plain(tree):
    """Normalize flax Frozen/plain dicts to nested plain dicts so the scan
    carry keeps one stable container type across switch branches."""
    if hasattr(tree, "items"):
        return {k: _plain(v) for k, v in tree.items()}
    return tree


def _merge(old: dict, new: dict) -> dict:
    out = dict(old)
    for k, v in new.items():
        out[k] = _merge(old[k], v) if isinstance(v, dict) else v
    return out


def make_pp_infer_fn(model, variables, anchors_norm, mesh: Mesh,
                     microbatch: int,
                     num_microbatches: int,
                     pipe_axis: str = "pipe",
                     cuts: Optional[Sequence[int]] = None,
                     image_hw: Tuple[int, int] = (640, 640),
                     strides: Tuple[int, ...] = (8, 16, 32),
                     conf_threshold: float = 0.25,
                     iou_threshold: float = 0.45,
                     max_detections: int = 300,
                     pre_nms_topk: int = 1024,
                     backend: str = "auto",
                     data_axis: Optional[str] = None) -> Callable:
    """Build a jitted PP inference function `(images) -> (det, valid)`.

    images: (num_microbatches * D * microbatch, H, W, 3) with
    D = mesh.shape[data_axis] (1 without a data axis) — M micro-batches
    stream through the S pipeline stages in M+S-1 ticks inside ONE jit;
    with a data axis (make_dp_pp_mesh), every replica pipelines its own
    batch shard. The last stage runs the fused postprocess (decode + NMS)
    on each micro-batch as it drains, so only (mb, max_det, 6) detections
    — not 25k-row logits — accumulate across ticks. Results are identical
    to the single-device fused pipeline (per-image postprocess), parity-
    tested in tests/test_pp.py.
    """
    from yolov5m_tpu.ops.postprocess import fused_detect

    from yolov5m_tpu.parallel.dp import resolve_data_axis

    S = mesh.shape[pipe_axis]
    # an explicit DP-composition request must not degrade, alias the pipe
    # axis, or die in a bare KeyError: validate against the axis inventory
    data_axis = resolve_data_axis(data_axis, mesh, reserved=(pipe_axis,))
    D = mesh.shape[data_axis] if data_axis else 1
    M, mb = num_microbatches, microbatch
    plan = StagePlan(model, variables, (mb, *image_hw, 3), S, cuts)
    anchors_norm = jnp.asarray(anchors_norm)
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    T = M + S - 1
    kw = dict(strides=strides, conf_threshold=conf_threshold,
              iou_threshold=iou_threshold, max_detections=max_detections,
              pre_nms_topk=pre_nms_topk, backend=backend)

    def stage_branch(b):
        steps = [_STEPS[i] for i in plan.stage_steps[b]]

        def run(m, vals):
            for name, _, _, fn in steps:
                vals[name] = fn(m, vals, False)
            return vals

        def branch(buf, t, images, det_buf, val_buf):
            if b == 0:
                x0 = lax.dynamic_index_in_dim(
                    images, jnp.clip(t, 0, M - 1), keepdims=False)
                vals = {"x0": x0.astype(model.dtype)}
            else:
                vals = plan.unpack(buf, b - 1)
            vals = model.apply(variables, vals, method=run)
            if b == S - 1:
                det, valid = fused_detect(list(vals["out"]), anchors_norm,
                                          **kw)
                # fill-phase garbage lands at index 0 and is overwritten
                # by micro-batch 0's real result at tick S-1 (scan order)
                m_idx = jnp.clip(t - (S - 1), 0, M - 1)
                det_buf = lax.dynamic_update_index_in_dim(
                    det_buf, det.astype(det_buf.dtype), m_idx, 0)
                val_buf = lax.dynamic_update_index_in_dim(
                    val_buf, valid.astype(val_buf.dtype), m_idx, 0)
                return buf, det_buf, val_buf
            return plan.pack(vals, b), det_buf, val_buf

        return branch

    branches = [stage_branch(b) for b in range(S)]
    perm = [(i, i + 1) for i in range(S - 1)]

    batch_spec = P(None, data_axis) if data_axis else P()

    @functools.partial(shard_map, mesh=mesh, in_specs=(batch_spec,),
                       out_specs=(batch_spec, batch_spec), check_vma=False)
    def pp_infer_sm(images):
        stage = lax.axis_index(pipe_axis)

        def tick(carry, t):
            buf, det_buf, val_buf = carry
            buf = lax.ppermute(buf, pipe_axis, perm)
            buf, det_buf, val_buf = lax.switch(
                stage, branches, buf, t, images, det_buf, val_buf)
            return (buf, det_buf, val_buf), None

        init = (jnp.zeros((mb, plan.buf_len), plan.value_dtype),
                jnp.zeros((M, mb, max_detections, 6), jnp.float32),
                jnp.zeros((M, mb, max_detections), jnp.float32))
        (_, det_buf, val_buf), _ = lax.scan(tick, init, jnp.arange(T))
        # only the last stage wrote detections; everyone else holds zeros
        det = lax.psum(det_buf, pipe_axis)
        valid = lax.psum(val_buf, pipe_axis) > 0.5
        return det, valid

    @jax.jit
    def pp_infer(images):
        det, valid = pp_infer_sm(
            images.reshape(M, D * mb, *images.shape[1:]))
        return (det.reshape(M * D * mb, max_detections, 6),
                valid.reshape(M * D * mb, max_detections))

    return pp_infer


def make_pp_train_step(model, loss_fn, optimizer, mesh: Mesh,
                       microbatch: int,
                       num_microbatches: int,
                       pipe_axis: str = "pipe",
                       cuts: Optional[Sequence[int]] = None,
                       image_hw: Tuple[int, int] = (640, 640),
                       donate: bool = True,
                       data_axis: Optional[str] = None) -> Callable:
    """GPipe training step: `step(state, image, labels, mask)` with image
    (M*D*mb, H, W, 3), labels (M*D*mb, nmax, 5), mask (M*D*mb, nmax),
    where D = mesh.shape[data_axis] (1 without a data axis).

    Numerically identical to M sequential single-device calls of the
    standard step at accumulate=M (the reference nominal-batch recipe,
    training_utils.py:87-90); state.step advances by M (it counts
    micro-batches, trainer.py:35). The backward is AD through the scanned
    forward, so HBM holds each stage's live set for its in-flight
    micro-batches (the GPipe stash); build the model with remat=True to
    trade that for recompute exactly as on one chip.

    DPxPP (data_axis given, mesh from make_dp_pp_mesh): each data replica
    runs the full pipeline on its shard of every micro-batch (micro-batch
    m's global rows [m*D*mb, (m+1)*D*mb) sharded over "data", matching
    dp.shard_batch's layout), `microbatch` stays the PER-REPLICA size.
    Gradients sum over data replicas automatically (the AD transpose of
    the replicated-param broadcast is a psum over every mesh axis), the
    loss is the exact GLOBAL masked mean per micro-batch (numerators and
    denominators summed across shards before dividing — see the module
    AD note; correct even when shards hold different valid-box counts),
    and BN running stats are pmean-synced over "data" after the pipe
    ownership merge — the exact semantics of dp.make_dp_train_step at
    accumulate=M, which the equivalence test pins (tests/test_pp.py,
    including an uneven-box-count case).

    Metrics: loss/parts are per-micro-batch MEANS of the global
    (data-summed) loss (the accumulate path reports the last
    micro-batch's); grad_norm is the norm of the summed pre-clip gradient.

    KNOWN multi-chip ingress limitation: inputs arrive REPLICATED on every
    mesh device (in_shardings=P()) because the micro-batch-major flat row
    layout cannot be sharded on dim 0 by "data" directly — on real
    hardware that is D*S x the ingress HBM/interconnect traffic of a
    data-sharded feed, though only ~batch-sized (activations, the actual
    PP traffic, are ppermuted not replicated). A data-major input contract
    ((M, D*mb, ...) with dim 1 sharded) would remove it; left as-is
    because DP dominates PP for every model that fits a chip (module
    docstring) and the equivalence tests pin the current layout.
    """
    from yolov5m_tpu.train.trainer import _ema_decay

    from yolov5m_tpu.parallel.dp import resolve_data_axis

    S = mesh.shape[pipe_axis]
    # an explicit DP-composition request must not degrade, alias the pipe
    # axis, or die in a bare KeyError: validate against the axis inventory
    data_axis = resolve_data_axis(data_axis, mesh, reserved=(pipe_axis,))
    D = mesh.shape[data_axis] if data_axis else 1
    M, mb = num_microbatches, microbatch
    T = M + S - 1
    perm = [(i, i + 1) for i in range(S - 1)]

    var_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, *image_hw, 3), jnp.float32))
    plan = StagePlan(model, var_shapes, (mb, *image_hw, 3), S, cuts)

    # loss numerator/denominator structure ({"box","obj","cls"}: (nl,),
    # see YoloLoss.num_den) — zeros template for the non-final branches
    outs = [jnp.zeros(s.shape, s.dtype) for s in plan.out_shapes]
    nd_struct = jax.eval_shape(
        loss_fn.num_den, outs, jnp.zeros((mb, 1, 5), jnp.float32),
        jnp.zeros((mb, 1), bool))[0]

    def zero_nd():
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                            nd_struct)

    def stage_branch(b, params, images, labels, mask):
        steps = [_STEPS[i] for i in plan.stage_steps[b]]

        def run(m, vals):
            for name, _, _, fn in steps:
                vals[name] = fn(m, vals, True)
            return vals

        def branch(buf, t, stats):
            valid = jnp.logical_and(t >= b, t - b < M)
            if b == 0:
                x0 = lax.dynamic_index_in_dim(
                    images, jnp.clip(t, 0, M - 1), keepdims=False)
                vals = {"x0": x0.astype(model.dtype)}
            else:
                vals = plan.unpack(buf, b - 1)
            vals, mut = model.apply(
                {"params": params, "batch_stats": stats},
                vals, method=run, mutable=["batch_stats"])
            new_stats = _merge(stats, _plain(mut["batch_stats"]))
            # pipeline-bubble ticks must not advance the running stats
            new_stats = jax.tree.map(
                lambda n, o: jnp.where(valid, n, o), new_stats, stats)
            if b == S - 1:
                m_idx = jnp.clip(t - (S - 1), 0, M - 1)
                lab = lax.dynamic_index_in_dim(labels, m_idx,
                                               keepdims=False)
                msk = lax.dynamic_index_in_dim(mask, m_idx, keepdims=False)
                # raw masked-mean numerators/denominators of this (local
                # shard of this) micro-batch — the division into means
                # happens OUTSIDE shard_map, after the cross-device sum,
                # so DPxPP gets the exact global masked mean even when
                # valid-box counts differ across data shards
                nums, dens = loss_fn.num_den(list(vals["out"]), lab, msk)
                v = valid.astype(jnp.float32)
                return (buf, new_stats,
                        jax.tree.map(lambda x: x * v, nums),
                        jax.tree.map(lambda x: x * v, dens))
            return (plan.pack(vals, b), new_stats, zero_nd(), zero_nd())

        return branch

    # The differentiated output (loss) leaves shard_map UN-reduced as a
    # length-1-per-device vector sharded over every mesh axis (see
    # AD-correctness note in the module docstring); stats/parts are aux
    # and may psum internally. Batches are replicated over pipe and (when
    # composing with DP) sharded over data.
    dev_axes = ((data_axis, pipe_axis) if data_axis else (pipe_axis,))
    batch_spec = P(None, data_axis) if data_axis else P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), batch_spec, batch_spec, batch_spec),
        out_specs=((P(dev_axes), P(dev_axes)), P()), check_vma=False)
    def pp_loss_sm(params, stats, images, labels, mask):
        stage = lax.axis_index(pipe_axis)
        branches = [stage_branch(b, params, images, labels, mask)
                    for b in range(S)]

        def tick(carry, t):
            buf, st, nums_acc, dens_acc = carry
            buf = lax.ppermute(buf, pipe_axis, perm)
            buf, st, num_t, den_t = lax.switch(stage, branches, buf, t, st)
            # PER-MICRO-BATCH slots (not a running sum): the baseline
            # computes each micro-batch's masked means on its own
            # denominators, so num/den pairs must stay separable by m
            m_idx = jnp.clip(t - (S - 1), 0, M - 1)
            nums_acc = jax.tree.map(lambda a, u: a.at[m_idx].add(u),
                                    nums_acc, num_t)
            dens_acc = jax.tree.map(lambda a, u: a.at[m_idx].add(u),
                                    dens_acc, den_t)
            return (buf, st, nums_acc, dens_acc), None

        def zero_md():
            return jax.tree.map(
                lambda s: jnp.zeros((M, *s.shape), s.dtype), nd_struct)

        init = (jnp.zeros((mb, plan.buf_len), plan.value_dtype),
                _plain(stats), zero_md(), zero_md())
        (_, st, nums_acc, dens_acc), _ = lax.scan(tick, init,
                                                  jnp.arange(T))
        # exact BN-stat merge: each module's stats from its owning stage
        # (every other device still holds that module's initial values)
        new_stats = {
            mod: jax.tree.map(
                lambda x: lax.psum(
                    jnp.where(stage == plan.module_stage[mod], x,
                              jnp.zeros_like(x)), pipe_axis), sub)
            for mod, sub in st.items()}
        if data_axis:
            # DPxPP: replicas saw different batch shards; pmean-sync the
            # running buffers so replicas never diverge — the same
            # local-BN-stats semantics as dp.make_dp_train_step
            new_stats = jax.tree.map(
                lambda x: lax.pmean(x, data_axis), new_stats)
        return (nums_acc, dens_acc), new_stats

    n_dev = D * S

    def step(state, image, labels, mask):
        image = image.reshape(M, D * mb, *image.shape[1:])
        labels = labels.reshape(M, D * mb, *labels.shape[1:])
        mask = mask.reshape(M, D * mb, *mask.shape[1:])

        def loss_of(params):
            # each (M, nl) num/den leaf leaves shard_map device-stacked as
            # (n_dev*M, nl); summing over the device axis OUTSIDE shard_map
            # (AD trivially exact, see module docstring) is simultaneously
            # the stage merge (non-final stages contribute zeros) and the
            # data-replica psum of numerators and denominators — then each
            # micro-batch's GLOBAL masked means are composed on the global
            # batch size D*mb, exactly like one dp.make_dp_train_step call
            (nums, dens), new_stats = pp_loss_sm(
                params, state.batch_stats, image, labels, mask)
            nums, dens = jax.tree.map(
                lambda x: x.reshape(n_dev, M, *x.shape[1:]).sum(0),
                (nums, dens))
            totals, parts = jax.vmap(
                lambda n, d: loss_fn.compose(n, d, D * mb))(nums, dens)
            return totals.sum(), (parts, new_stats)

        (total, (parts, new_stats)), grads = \
            jax.value_and_grad(loss_of, has_aux=True)(state.params)
        parts = jax.tree.map(lambda p: p.sum() / M, parts)

        # identical epilogue to the accumulate path's firing step
        # (trainer.py:244-264) on the micro-batch-summed gradients
        step_ct = state.step + M
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = _ema_decay(step_ct // M)
        new_ema = jax.tree.map(lambda e, p2: e * d + p2 * (1.0 - d),
                               state.ema_params, new_params)
        new_state = state.replace(
            step=step_ct, params=new_params, batch_stats=new_stats,
            opt_state=new_opt, ema_params=new_ema)
        return new_state, {"loss": total / M,
                           "grad_norm": optax.global_norm(grads), **parts}

    repl = NamedSharding(mesh, P())
    return jax.jit(step, in_shardings=(repl, repl, repl, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())

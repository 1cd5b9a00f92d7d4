"""Tensor-parallel (TP) execution: the CHANNEL axis sharded over a mesh.

The parallelism matrix so far: DP (parallel/dp.py, infer.py) shards the
batch — perfect throughput scaling, needs bs >= mesh; SP (parallel/sp.py)
shards image rows — the latency axis, but it runs out exactly where the
model gets heavy per-pixel: the P5 grid at 640² has 20 rows, so past
n_spatial=8 the halo IS the shard. TP shards the axis that keeps growing
as the grid shrinks — channels (768 at P5 on the m variant, 1280 on x) —
by placing every conv kernel sharded along its OUTPUT-channel dim and
every per-channel vector (bias, BN scale/shift/stats) along its channel
dim. Use TP as the third axis of a (data, spatial, model) mesh for
low-latency serving of the large family variants, or alone when one
image must be answered by many chips and the resolution is too small
for SP.

GSPMD design, same stance as parallel/sp.py: the sharding annotations ARE
the distributed program. We annotate only the PARAMS; XLA's partitioner
propagates channel shardings through conv/BN/SiLU/concat/residual ops and
inserts the collectives each op needs (all-gather of channel-sharded
activations ahead of a conv that consumes all input channels,
reduce-scatter behind it). No manual psum choreography. SPMD partitioning
preserves program semantics exactly — numeric parity vs the single-device
pipeline is pinned by tests/test_tp.py.

All latency/ICI-traffic statements above are PROJECTED (this environment
has one physical chip): TP correctness and sharding propagation are
verified on the virtual 8-device CPU mesh (tests/test_tp.py,
dryrun_multichip), but no multi-chip latency number exists for any of it.

Channel dims that don't divide the mesh axis (the 255-channel detection
head outputs, 3-channel stem input) simply stay replicated — the rule is
per-leaf divisibility, so every family variant shards cleanly without a
per-model table.

The reference is single-GPU torch with no model parallelism of any kind
(SURVEY.md §2); this module has no reference counterpart to cite beyond
the model it shards (reference model.py:146-176).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(n_data: int = 1, n_model: int = 2,
                 data_axis: str = "data",
                 model_axis: str = "model") -> Mesh:
    """A 2-D (data, model) mesh over the first n_data*n_model devices.

    The model axis is minor (fastest-varying) so the per-layer channel
    collectives ride nearest-neighbor ICI links under the default device
    enumeration, mirroring make_sp_mesh's layout argument.
    """
    from yolov5m_tpu.parallel.dp import make_mesh2d
    return make_mesh2d(n_data, n_model, data_axis, model_axis)


def variable_pspec(path_leaf, n_model: int, model_axis: str) -> P:
    """The TP PartitionSpec for one variables/state leaf.

    Conv kernels are flax HWIO (ndim 4): shard the O dim when divisible.
    Per-channel vectors (bias, BN scale/bias/mean/var — ndim 1): shard dim
    0 when divisible. Everything else (scalars, odd widths like the
    255-channel head) replicates.
    """
    leaf = path_leaf
    if hasattr(leaf, "shape"):
        shape = tuple(leaf.shape)
    else:  # python scalar (an optax count, a donate flag) — replicate
        return P()
    if len(shape) == 4 and shape[-1] % n_model == 0:
        return P(None, None, None, model_axis)
    if len(shape) == 1 and shape[0] % n_model == 0 and shape[0] >= n_model:
        return P(model_axis)
    return P()


def shard_variables_tp(variables, mesh: Mesh, model_axis: str = "model"):
    """device_put a variables pytree (params / batch_stats / a TrainState's
    param-shaped leaves) with the TP channel shardings."""
    n_model = mesh.shape[model_axis]
    return jax.device_put(
        variables,
        jax.tree.map(
            lambda x: NamedSharding(
                mesh, variable_pspec(x, n_model, model_axis)), variables))


def make_tp_infer_fn(model, variables, anchors_norm, mesh: Mesh,
                     model_axis: str = "model",
                     data_axis: Optional[str] = "data",
                     strides: Tuple[int, ...] = (8, 16, 32),
                     conf_threshold: float = 0.25,
                     iou_threshold: float = 0.45,
                     max_detections: int = 300,
                     pre_nms_topk: int = 1024,
                     backend: str = "auto",
                     uint8_ingress: bool = False) -> Callable:
    """Build a jitted TP inference function `(images) -> (det, valid)`.

    model/variables: a fused (BN-folded) or plain YOLOv5 + its variables.
    images: (bs, H, W, 3); bs sharded over `data_axis` when the mesh has
    one (pass data_axis=None for a pure-TP 1-D mesh). A host array works
    directly — jit shards it on transfer. With uint8_ingress the images
    are uint8 and the /255 normalize runs on device INSIDE the one jit
    (4x less host→device traffic, bit-identical — serving/server.py).

    The convs run channel-sharded; the head logits are gathered back to
    batch-only sharding (replicated over `model_axis`) before the global
    postprocess, exactly as SP regathers its row shards — the logits are
    ~100x smaller than the early activations.

    Returns per-image (bs, max_detections, 6) and a (bs, max_detections)
    valid mask, batch-sharded. Semantics identical to the single-device
    fused pipeline — parity-tested in tests/test_tp.py.
    """
    from yolov5m_tpu.ops.postprocess import fused_detect

    from yolov5m_tpu.parallel.dp import resolve_data_axis
    data_axis = resolve_data_axis(data_axis, mesh, reserved=(model_axis,))
    anchors_norm = jnp.asarray(anchors_norm)
    variables = shard_variables_tp(variables, mesh, model_axis)

    img_sharding = NamedSharding(mesh, P(data_axis))
    out_sharding = NamedSharding(mesh, P(data_axis))

    @functools.partial(jax.jit, in_shardings=img_sharding,
                       out_shardings=(out_sharding, out_sharding))
    def tp_infer(images):
        if uint8_ingress:
            from yolov5m_tpu.ops.preprocess import normalize_uint8
            images = normalize_uint8(
                images, getattr(model, "dtype", None) or jnp.float32)
        preds = model.apply(variables, images, train=False)
        # leave the channel-sharded regime before the global postprocess
        preds = [jax.lax.with_sharding_constraint(p, out_sharding)
                 for p in preds]
        return fused_detect(preds, anchors_norm, strides=strides,
                            conf_threshold=conf_threshold,
                            iou_threshold=iou_threshold,
                            max_detections=max_detections,
                            pre_nms_topk=pre_nms_topk, backend=backend)

    return tp_infer


def make_tp_train_step(model, loss_fn, optimizer, mesh: Mesh,
                       accumulate: int = 1,
                       model_axis: str = "model",
                       data_axis: Optional[str] = "data",
                       donate: bool = True) -> Callable:
    """TP training: jit the standard train step with every param-shaped
    leaf of the TrainState (params, Adam mu/nu, EMA, batch_stats) sharded
    along its channel dim and the batch over `data_axis`. GSPMD partitions
    fwd+bwd; per-channel BN statistics are channel-local, so sharding
    channels never crosses a BN reduction — the collectives are the same
    activation gathers the inference path needs plus their transposes in
    the backward.

    Use when one replica's params+optimizer don't fit a chip (the x
    variant at high resolution with a long EMA history) or to widen a
    (data, model) mesh past the batch size. Parity vs the single-device
    step is pinned by tests/test_tp.py (params after one step, same
    tolerance discipline as tests/test_sp_train.py).

    Returns `step(state, image, labels, mask) -> (state, metrics)`.

    donate=True (default, like parallel/pp.py — a training loop rebinds
    the state every step) donates the input TrainState buffers so the ~6
    param-sized arrays update in place; pass donate=False to keep the
    pre-step state alive (e.g. for before/after comparisons). NOTE:
    parallel/dp.py's make_dp_train_step defaults the same knob to False.
    """
    from yolov5m_tpu.train.trainer import make_train_step

    from yolov5m_tpu.parallel.dp import resolve_data_axis
    data_axis = resolve_data_axis(data_axis, mesh, reserved=(model_axis,))
    n_model = mesh.shape[model_axis]

    step = make_train_step(model, loss_fn, optimizer, accumulate)

    def state_shardings(state):
        return jax.tree.map(
            lambda x: NamedSharding(
                mesh, variable_pspec(x, n_model, model_axis)), state)

    img_s = NamedSharding(mesh, P(data_axis))
    row_s = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())

    cache = {}  # one jitted step per state treedef (stable across steps)
    donate_kw = {"donate_argnums": (0,)} if donate else {}

    def tp_step(state, image, labels, mask):
        key = jax.tree.structure(state)
        if key not in cache:
            st_sh = state_shardings(state)
            cache[key] = jax.jit(step,
                                 in_shardings=(st_sh, img_s, row_s, row_s),
                                 out_shardings=(st_sh, repl),
                                 **donate_kw)
        return cache[key](state, image, labels, mask)

    return tp_step


def shard_state_tp(state, mesh: Mesh, model_axis: str = "model"):
    """device_put a TrainState with the TP channel shardings on every
    param-shaped leaf (scalars and odd widths replicate)."""
    return shard_variables_tp(state, mesh, model_axis)

"""Post-training int8 quantization (PTQ) for the serving path.

TPU MXUs run int8×int8→int32 at twice the bf16 rate (~394 TOPS vs ~197
TFLOPS on v5e; measured live in benchmarks/probe_int8.py — the int8 conv
path is real, not an upcast fallback). This module converts a trained model
into an int8 inference model in three steps:

  1. fold BatchNorm (models/fuse.py) — PTQ operates on the fused graph;
  2. calibrate: run the fused bf16 model over a few batches with
     ``calibrate=True`` — every CBL sows its input absmax
     (blocks.py CBL.sow) — and keep the max per conv;
  3. quantize: weights per-output-channel symmetric int8
     (s_w = absmax(w)/127 per channel), activations per-tensor symmetric
     int8 against the calibrated scale (s_in = absmax/127).

The head's 1×1 output convs stay in the compute dtype (first/last-layer
precision is the standard PTQ accuracy guard); every CBL conv — the bulk of
the FLOPs — runs int8. There is no reference equivalent (the reference
serves fp32 torch, SURVEY.md §2); this is a beyond-parity serving feature.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import jax
import numpy as np
from flax import traverse_util

from yolov5m_tpu.models.fuse import fold_batchnorm


def collect_calibration_absmax(fused_model, fused_variables,
                               batches: Iterable) -> Dict[Tuple[str, ...], float]:
    """Run the fused model over calibration batches; return per-CBL input
    absmax keyed by the sow path (e.g. ("backbone_0", "in_absmax")).
    """
    calib = fused_model.clone(calibrate=True)

    @jax.jit
    def run(v, x):
        _, inter = calib.apply(v, x, train=False, mutable=["intermediates"])
        return inter["intermediates"]

    merged: Dict[Tuple[str, ...], float] = {}
    for x in batches:
        flat = traverse_util.flatten_dict(jax.device_get(run(fused_variables, x)))
        for path, value in flat.items():
            # sow stores under (<cbl path...>, "in_absmax"); with a reduce_fn
            # the value is the reduced scalar (flax may still wrap in a tuple
            # on first store)
            v = float(np.max(np.asarray(value)))
            merged[path] = max(merged.get(path, 0.0), v)
    assert merged, "calibration produced no absmax — is the model fused CBLs?"
    return merged


def quantize_fused_params(fused_variables,
                          absmax: Dict[Tuple[str, ...], float]) -> dict:
    """fused bf16/f32 params + calibration → int8 params for the quant model.

    Every CBL conv becomes {w_q int8 (per-out-channel), s_w, bias, s_in};
    head convs (path under "head") copy through unquantized.
    """
    params = traverse_util.flatten_dict(fused_variables["params"])
    q = {}
    for path, value in params.items():
        if path[-2:] == ("conv", "kernel") and path[0] != "head":
            parent = path[:-2]
            w = np.asarray(value, np.float32)                    # HWIO
            s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
            s_w = np.maximum(s_w, 1e-12).astype(np.float32)
            q[parent + ("w_q",)] = np.clip(
                np.round(w / s_w), -127, 127).astype(np.int8)
            q[parent + ("s_w",)] = s_w
            q[parent + ("bias",)] = np.asarray(
                params[parent + ("conv", "bias")], np.float32)
            am = absmax.get(parent + ("in_absmax",))
            assert am is not None, f"no calibration absmax for {parent}"
            q[parent + ("s_in",)] = np.float32(max(am, 1e-12) / 127.0)
        elif path[-2] == "conv" and path[0] != "head":
            continue                                             # bias: folded above
        else:
            q[path] = value                                      # head convs
    return traverse_util.unflatten_dict(q)


def quantize_chain_params(fused_variables,
                          absmax: Dict[Tuple[str, ...], float]) -> dict:
    """fused params + calibration → int8 ACTIVATION-CHAIN params
    (blocks.CBL.chain): the fused scheme's per-CBL {w_q, s_w, bias, s_in}
    (delegated to quantize_fused_params so the shared math — scale floor,
    rounding, head-skip — lives once) plus s_out, the calibrated OUTPUT
    scale the epilogue requantizes to, and per-Bottleneck {s_res} for the
    post-residual-sum scale. Head convs copy through unquantized
    (first/last-layer precision guard)."""
    q = traverse_util.flatten_dict(
        quantize_fused_params(fused_variables, absmax))
    for path, am in absmax.items():
        if path[-1] == "out_absmax" and path[:-1] + ("s_in",) in q:
            q[path[:-1] + ("s_out",)] = np.float32(max(am, 1e-12) / 127.0)
        elif path[-1] == "res_absmax":
            q[path[:-1] + ("s_res",)] = np.float32(max(am, 1e-12) / 127.0)
    missing = [p[:-1] for p in q
               if p[-1:] == ("s_in",) and p[:-1] + ("s_out",) not in q]
    assert not missing, f"missing out_absmax calibration for {missing[:3]}"
    return traverse_util.unflatten_dict(q)


def quantize_int8(model, variables, calib_batches: Iterable,
                  chain: bool = True):
    """One-call PTQ: (train-style or fused variables) → (quant model, vars).

    model: the YOLOv5 module the variables belong to (fused or not).
    variables: {"params", "batch_stats"} (BN folded here) or fused {"params"}.
    calib_batches: iterable of (bs, H, W, 3) image arrays in model input
    domain (post-normalization, i.e. /255 like training/serving inputs).
    chain (default): int8 activation chain — activations stay int8 between
    CBLs with one requantization per tensor in the conv epilogue; concats
    run as exact split convolutions (blocks.CBL docstring). chain=False is
    the per-block scheme (bf16 between blocks; measured a net LOSS
    end-to-end — kept for A/B).
    """
    fused_model = model if getattr(model, "fused", False) \
        else model.clone(fused=True)
    fused_vars = fold_batchnorm(variables) if "batch_stats" in variables \
        else variables
    absmax = collect_calibration_absmax(fused_model, fused_vars, calib_batches)
    if chain:
        qparams = quantize_chain_params(fused_vars, absmax)
        return (fused_model.clone(quant=True, quant_chain=True),
                {"params": qparams})
    qparams = quantize_fused_params(fused_vars, absmax)
    return fused_model.clone(quant=True), {"params": qparams}

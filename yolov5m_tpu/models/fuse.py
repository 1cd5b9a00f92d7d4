"""Inference-time BatchNorm folding.

Folds each CBL's BatchNorm into its convolution (kernel scaled per output
channel, bias absorbing the normalization shift), producing variables for an
inference model where CBL = conv(bias=True) + SiLU and no BN op exists in the
graph. This is the deployment-strip analog of the reference's
`strip_model`/half() utilities (reference utils/utils.py:25-28) done the XLA
way: fewer ops to fuse, one epilogue per conv.

  y = scale * (conv(x) - mean) / sqrt(var + eps) + bias
    = conv'(x) + b'    with  conv' = conv * s,  s = scale/sqrt(var+eps),
                             b' = bias - mean * s
"""

from __future__ import annotations

import jax
import numpy as np
from flax import traverse_util

from yolov5m_tpu.models.blocks import BN_EPS


def _fold(variables, sqrt_scale) -> dict:
    """One fold implementation for both the host and the traced path —
    `sqrt_scale(scale, var) -> s` is the only part that differs (host
    numpy upcasts var to f64 for the sqrt; the device path stays f32,
    jax's default x64-disabled precision)."""
    params = traverse_util.flatten_dict(variables["params"])
    stats = traverse_util.flatten_dict(variables["batch_stats"])

    fused = {}
    for path, value in params.items():
        if path[-2:] == ("conv", "kernel"):
            parent = path[:-2]
            bn_scale = params.get(parent + ("bn", "scale"))
            if bn_scale is None:            # head convs: no BN, copy through
                fused[path] = value
                continue
            bn_bias = params[parent + ("bn", "bias")]
            mean = stats[parent + ("bn", "mean")]
            var = stats[parent + ("bn", "var")]
            s = sqrt_scale(bn_scale, var)
            fused[path] = value * s                             # HWIO: O last
            fused[parent + ("conv", "bias")] = bn_bias - mean * s
        elif path[-2] == "bn":
            continue                                            # dropped
        else:                                                   # head bias etc.
            fused[path] = value

    return {"params": traverse_util.unflatten_dict(fused)}


def fold_batchnorm(variables) -> dict:
    """Fold BN into conv weights. Returns {'params': ...} for a fused model
    (YOLOv5 with fused=True): conv gets a bias, bn entries are dropped.
    Host path: numpy, f64 sqrt for the per-channel scale.
    """
    def sqrt_scale(scale, var):
        s = np.asarray(scale) / np.sqrt(np.asarray(var, np.float64) + BN_EPS)
        return np.asarray(s, np.float32)

    return _fold(jax.tree.map(np.asarray, variables), sqrt_scale)


def fold_batchnorm_device(variables) -> dict:
    """Traceable (jnp) BN fold — same math as fold_batchnorm but usable INSIDE
    a jit, so an evaluator can fold fresh (e.g. EMA) weights on device every
    epoch without fetching ~85MB of params to the host. The per-channel
    scale/shift is a negligible fraction of one forward pass.
    """
    import jax.numpy as jnp

    def sqrt_scale(scale, var):
        return (scale / jnp.sqrt(var.astype(jnp.float32) + BN_EPS)
                ).astype(jnp.float32)

    return _fold(variables, sqrt_scale)

"""int8 PTQ correctness (models/quantize.py + blocks.py CBL quant path).

The quantized model must track the fused bf16/f32 model closely on the head
logits (per-output-channel weight scales + calibrated per-tensor activation
scales), and the quantized parameter tree must actually be int8 where it
claims to be.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.quantize import (
    collect_calibration_absmax, quantize_fused_params, quantize_int8)

HW = 128


def _model_and_vars():
    model = YOLOv5(first_out=8, nc=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))
    # perturb running stats away from identity so BN folding is non-trivial
    return model, {
        "params": v["params"],
        "batch_stats": jax.tree.map(lambda x: x + 0.01, v["batch_stats"]),
    }


def _batches(n, rng):
    return [jnp.asarray(rng.uniform(0, 1, (2, HW, HW, 3)), jnp.float32)
            for _ in range(n)]


import pytest


@pytest.mark.parametrize("chain", [True, False])
def test_quantized_model_tracks_fused_model(rng, chain):
    """Both int8 schemes (activation chain = default; per-block = legacy)
    track the fused bf16/f32 model on head logits. The chain scheme
    additionally quantizes residual sums and requantizes in-epilogue, so it
    gets the same 2% budget."""
    model, v = _model_and_vars()
    qmodel, qvars = quantize_int8(model, v, _batches(2, rng), chain=chain)
    assert getattr(qmodel, "quant_chain", False) == chain
    x = jnp.asarray(rng.uniform(0, 1, (2, HW, HW, 3)), jnp.float32)

    ref = model.clone(fused=True).apply(fold_batchnorm(v), x, train=False)
    out = qmodel.apply(qvars, x, train=False)
    for r, q in zip(ref, out):
        r = np.asarray(r, np.float32)
        q = np.asarray(q, np.float32)
        rel = np.sqrt(np.mean((r - q) ** 2)) / np.sqrt(np.mean(r ** 2))
        assert rel < 0.02, f"int8 deviates {rel:.4f} from fused model"


def test_chain_param_tree_has_output_scales(rng):
    """Chain params carry s_out per CBL and s_res per Bottleneck, and the
    chain module's own init reproduces the exact same tree structure."""
    model, v = _model_and_vars()
    qmodel, qvars = quantize_int8(model, v, _batches(1, rng), chain=True)
    flat = traverse_util.flatten_dict(qvars["params"])
    n_out = sum(1 for p in flat if p[-1] == "s_out")
    n_res = sum(1 for p in flat if p[-1] == "s_res")
    assert n_out > 30 and n_res >= 4          # every CBL / every Bottleneck
    for p, leaf in flat.items():
        if p[-1] in ("s_out", "s_res", "s_in"):
            assert float(leaf) > 0
    tmpl = qmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))
    assert (set(traverse_util.flatten_dict(tmpl["params"]).keys())
            == set(flat.keys()))


def test_quant_param_tree_structure(rng):
    model, v = _model_and_vars()
    qmodel, qvars = quantize_int8(model, v, _batches(1, rng))
    flat = traverse_util.flatten_dict(qvars["params"])
    n_q = 0
    for path, leaf in flat.items():
        if path[-1] == "w_q":
            assert np.asarray(leaf).dtype == np.int8
            n_q += 1
            parent = path[:-1]
            assert (parent + ("s_w",)) in flat
            assert (parent + ("bias",)) in flat
            assert (parent + ("s_in",)) in flat
            assert float(flat[parent + ("s_in",)]) > 0
        if path[0] == "head":
            # head convs stay unquantized (first/last-layer precision guard)
            assert path[-1] in ("kernel", "bias")
    assert n_q > 30  # every CBL in backbone+neck quantized
    # the quant module's own init produces the same tree structure
    tmpl = qmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))
    assert (set(traverse_util.flatten_dict(tmpl["params"]).keys())
            == set(flat.keys()))


def test_calibration_absmax_monotone(rng):
    model, v = _model_and_vars()
    fused_model = model.clone(fused=True)
    fused_vars = fold_batchnorm(v)
    b1 = _batches(1, rng)
    b2 = b1 + [5.0 * b1[0]]  # larger-range batch can only raise absmax
    a1 = collect_calibration_absmax(fused_model, fused_vars, b1)
    a2 = collect_calibration_absmax(fused_model, fused_vars, b2)
    assert set(a1) == set(a2)
    for k in a1:
        assert a2[k] >= a1[k] - 1e-6


def test_weight_quantization_error_bound(rng):
    """Per-channel symmetric quantization: |w - s_w * w_q| <= s_w/2."""
    model, v = _model_and_vars()
    fused_vars = fold_batchnorm(v)
    absmax = collect_calibration_absmax(model.clone(fused=True), fused_vars,
                                        _batches(1, rng))
    q = traverse_util.flatten_dict(quantize_fused_params(fused_vars, absmax))
    f = traverse_util.flatten_dict(fused_vars["params"])
    checked = 0
    for path, w in f.items():
        if path[-2:] == ("conv", "kernel") and path[0] != "head":
            parent = path[:-2]
            s_w = q[parent + ("s_w",)]
            w_q = q[parent + ("w_q",)].astype(np.float32)
            err = np.abs(np.asarray(w, np.float32) - w_q * s_w)
            assert np.all(err <= s_w / 2 + 1e-7)
            checked += 1
    assert checked > 30

"""PyTorch ↔ JAX weight conversion.

Replaces the reference's manual, shape-matching weight-porting script
(reference ultralytics_files/state_dict_loading.py) with an exact,
name-driven bidirectional mapping between the reference's torch state-dict
layout (reference model.py:178-208 module tree) and this framework's flax
variable tree. Conv kernels transpose OIHW→HWIO; BatchNorm running stats go
to the `batch_stats` collection.

Also used by tests: `torch_key_for_path` makes the expected torch key set
derivable from a freshly-initialized flax model, so synthetic state dicts can
exercise the converter without the reference installed.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util


def _module_token_to_torch(token: str) -> str:
    """Map one flax module name to its torch path fragment."""
    m = re.fullmatch(r"(backbone|neck)_(\d+)", token)
    if m:
        return f"{m.group(1)}.{m.group(2)}"
    m = re.fullmatch(r"out_conv(\d+)", token)
    if m:
        return f"out_convs.{m.group(1)}"
    m = re.fullmatch(r"seq(\d+)_([ab])", token)
    if m:  # neck-mode C3 pair: torch nn.Sequential indices 0/1
        return f"seq.{m.group(1)}.{'0' if m.group(2) == 'a' else '1'}"
    m = re.fullmatch(r"seq(\d+)", token)
    if m:
        return f"seq.{m.group(1)}"
    return token  # c1, c2, c_skipped, c_out, head


# (collection, leaf-module, leaf-param) → torch suffix inside a CBL
_CBL_LEAF = {
    ("params", "conv", "kernel"): "cbl.0.weight",
    ("params", "bn", "scale"): "cbl.1.weight",
    ("params", "bn", "bias"): "cbl.1.bias",
    ("batch_stats", "bn", "mean"): "cbl.1.running_mean",
    ("batch_stats", "bn", "var"): "cbl.1.running_var",
}


def torch_key_for_path(collection: str, path: Tuple[str, ...]) -> str:
    """Translate a flax variable path to the reference torch state-dict key.

    e.g. ('backbone_2', 'seq0', 'c1', 'conv', 'kernel') →
         'backbone.2.seq.0.c1.cbl.0.weight'
    """
    # Head output convs keep plain conv naming (reference model.py:159-163).
    if len(path) >= 2 and path[0] == "head":
        torch_mods = [_module_token_to_torch(t) for t in path[:-1]]
        leaf = {"kernel": "weight", "bias": "bias"}[path[-1]]
        return ".".join(torch_mods + [leaf])

    leaf_key = _CBL_LEAF[(collection, path[-2], path[-1])]
    torch_mods = [_module_token_to_torch(t) for t in path[:-2]]
    return ".".join(torch_mods + [leaf_key])


def _to_jax(torch_key: str, value: np.ndarray) -> np.ndarray:
    if torch_key.endswith("weight") and value.ndim == 4:  # conv OIHW → HWIO
        return np.transpose(value, (2, 3, 1, 0))
    return value


def _to_torch(torch_key: str, value: np.ndarray) -> np.ndarray:
    if torch_key.endswith("weight") and value.ndim == 4:  # HWIO → OIHW
        return np.transpose(value, (3, 2, 0, 1))
    return value


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray], variables) -> dict:
    """Fill a flax variable tree (from model.init) with torch weights.

    Args:
      state_dict: torch-layout name → numpy array (call .numpy() on tensors
        before passing; this module never imports torch).
      variables: template {'params': ..., 'batch_stats': ...}.
    Returns:
      New variables dict with converted weights (float32).
    Raises:
      KeyError on missing torch keys; ValueError on shape mismatch.
    """
    out = {}
    for collection in ("params", "batch_stats"):
        flat = traverse_util.flatten_dict(variables[collection])
        new_flat = {}
        for path, template in flat.items():
            tkey = torch_key_for_path(collection, path)
            if tkey not in state_dict:
                raise KeyError(f"torch state dict missing '{tkey}' (for {collection}/{path})")
            val = _to_jax(tkey, np.asarray(state_dict[tkey], dtype=np.float32))
            if val.shape != template.shape:
                raise ValueError(
                    f"shape mismatch for '{tkey}': torch {val.shape} vs flax {template.shape}")
            new_flat[path] = val
        out[collection] = traverse_util.unflatten_dict(new_flat)
    return out


def export_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict: flax variables → torch-layout dict."""
    sd = {}
    for collection in ("params", "batch_stats"):
        flat = traverse_util.flatten_dict(variables[collection])
        for path, value in flat.items():
            tkey = torch_key_for_path(collection, path)
            sd[tkey] = _to_torch(tkey, np.asarray(value, dtype=np.float32))
    return sd


def expected_torch_keys(variables) -> Dict[str, Tuple[int, ...]]:
    """All torch keys (and shapes) the converter consumes for this model."""
    keys = {}
    for collection in ("params", "batch_stats"):
        flat = traverse_util.flatten_dict(variables[collection])
        for path, value in flat.items():
            tkey = torch_key_for_path(collection, path)
            keys[tkey] = _to_torch(tkey, np.asarray(value)).shape
    return keys


# Committed flagship weights (trained on structured synthetic scenes by
# benchmarks/train_flagship_synth.py; provenance sidecar lives next to the
# blob). One loader for every harness that consumes them — bench.py,
# benchmarks/map_parity.py, benchmarks/profile_latency.py and the sidecar
# pin test all read the SAME bytes through the same code path, so a rename
# or dtype-handling change cannot make them silently diverge.
FLAGSHIP_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "weights", "flagship_synth_bf16.msgpack")


def load_flagship(fold: bool = True, missing_ok: bool = False):
    """Load the committed flagship weights as f32 flax variables.

    Returns ``(variables, sidecar)`` where ``sidecar`` is the provenance
    JSON dict (None if the sidecar file is absent). ``fold=True`` returns
    BN-folded variables for the ``fused=True`` serving model; ``fold=False``
    returns the raw {params, batch_stats} tree. With ``missing_ok=True`` a
    missing blob (fresh clone / installed wheel) yields ``(None, None)``
    instead of raising FileNotFoundError.
    """
    import json

    if not os.path.isfile(FLAGSHIP_WEIGHTS):
        if missing_ok:
            return None, None
        raise FileNotFoundError(FLAGSHIP_WEIGHTS)
    import jax
    from flax import serialization

    with open(FLAGSHIP_WEIGHTS, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    variables = jax.tree.map(lambda x: np.asarray(x, np.float32), raw)
    if fold:
        from .fuse import fold_batchnorm
        variables = fold_batchnorm(variables)
    sidecar = None
    sidecar_path = FLAGSHIP_WEIGHTS.replace(".msgpack", ".json")
    if os.path.isfile(sidecar_path):
        with open(sidecar_path) as f:
            sidecar = json.load(f)
    return variables, sidecar

"""YOLOv5m graph: CSP backbone + PANet neck + 3-scale anchor head.

Topology matches reference model.py:178-239 (so converted PyTorch weights are
numerically equivalent), but the implementation is TPU-native: NHWC tensors,
one flax module compiled by XLA in a single jit, bf16 compute with fp32
BatchNorm, static shapes.

Head output layout per scale is (bs, na, ny, nx, 5+nc), identical to the
reference's view+permute (model.py:170-173), with the same channel grouping
(anchor-major) so head weights convert 1:1.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import ANCHORS, STRIDES, Config
from yolov5m_tpu.models.blocks import C3, CBL, SPPF, upsample2x_nearest


def normalized_anchors(anchors=ANCHORS, strides=STRIDES) -> np.ndarray:
    """(nl, na, 2) anchors divided by their scale stride (reference model.py:156)."""
    a = np.asarray(anchors, np.float32)
    return a / np.asarray(strides, np.float32)[:, None, None]


class Head(nn.Module):
    """Per-scale 1x1 output convs + anchor-major reshape (reference model.py:143-175)."""

    nc: int
    na: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        outs = []
        no = 5 + self.nc
        for i, f in enumerate(feats):
            y = nn.Conv(no * self.na, (1, 1), dtype=self.dtype, name=f"out_conv{i}")(f)
            bs, ny, nx, _ = y.shape
            # NHWC channel order is anchor-major [(5+nc) x na], same memory
            # grouping as the reference's view(bs, na, 5+nc, ny, nx) on NCHW.
            y = y.reshape(bs, ny, nx, self.na, no).transpose(0, 3, 1, 2, 4)
            # keep compute dtype: casting ~25k x 85 logits to fp32 here costs
            # ~400MB of HBM traffic per 64-batch; consumers (loss, decode)
            # cast the rows they actually use
            outs.append(y)
        return outs


# YOLOv5 family presets: (first_out, depth_mult). Width scales channels
# (base 64 × width_multiple); depth scales the C3 stack counts (base 3/6/9/3
# × depth_multiple, min 1). The reference hardcodes the "m" point
# (first_out=48, depths 2/4/6/2 — model.py:184-207); the rest of the family
# follows the same (width, depth) law.
FAMILY = {
    "n": (16, 0.33),
    "s": (32, 0.33),
    "m": (48, 0.67),
    "l": (64, 1.00),
    "x": (80, 1.33),
}


def _scaled_depth(base: int, depth_mult: float) -> int:
    return max(round(base * depth_mult), 1)


class YOLOv5(nn.Module):
    """YOLOv5 detector parameterized by width (first_out) and depth
    (depth_mult). Defaults are the reference's YOLOv5m point (first_out=48,
    depth_mult=0.67 → C3 depths 2/4/6/2); see FAMILY for n/s/m/l/x."""

    first_out: int = 48
    nc: int = 80
    dtype: jnp.dtype = jnp.float32
    bn_axis: Optional[str] = None   # sync-BN mesh axis for DP (see blocks.CBL)
    fused: bool = False             # BN folded into convs (models/fuse.py)
    stem_s2d: bool = False          # space-to-depth stem rewrite (models/s2d.py)
    depth_mult: float = 0.67        # C3 stack scaling (YOLOv5 family law)
    quant: bool = False             # int8 PTQ inference (models/quantize.py)
    quant_chain: bool = False       # int8 ACTIVATION chain (blocks.CBL.chain)
    calibrate: bool = False         # sow per-CBL in/out absmax for calibration
    remat: bool = False             # rematerialize C3 stacks under grad
    remat_scope: str = "c3"         # "c3" | "all" (every backbone/neck block)

    def setup(self):
        fo, dt, ax = self.first_out, self.dtype, self.bn_axis
        fu = (self.fused, self.quant, self.calibrate, self.quant_chain)
        # remat: wrap the C3 stacks (the activation-heaviest blocks) in
        # jax.checkpoint so their internals recompute in the backward pass
        # instead of living in HBM across it — the standard TPU trade of
        # FLOPs for memory that lets l/x-width models train at 640² batches
        # that would otherwise exceed HBM. Parameter structure is unchanged.
        # remat_scope="all" additionally wraps every CBL and the SPPF, so
        # only block-boundary activations survive the forward — the finer
        # stash that lets bs=256 buckets fit where C3-only remat OOMs.
        assert self.remat_scope in ("c3", "all"), self.remat_scope
        wide = self.remat and self.remat_scope == "all"
        C3_ = (nn.remat(C3, static_argnums=(2,)) if self.remat else C3)
        # CBL's only static positional arg on the remat path is `train`
        # (arg index 2 counting self); `emit_float` is keyword-only in the
        # quant-chain path, which never composes with remat (chain asserts
        # quant=True and remat paths are bf16/f32 train).
        CBL_ = (nn.remat(CBL, static_argnums=(2,)) if wide else CBL)
        SPPF_ = (nn.remat(SPPF, static_argnums=(2,)) if wide else SPPF)
        d3 = _scaled_depth(3, self.depth_mult)   # m: 2
        d6 = _scaled_depth(6, self.depth_mult)   # m: 4
        d9 = _scaled_depth(9, self.depth_mult)   # m: 6
        # Backbone: 10 modules; taps after idx 4 (P3-level) and 6 (P4-level)
        # — reference model.py:184-195, 215-219.
        stem = (CBL_(fo, 3, 1, 1, dt, ax, *fu) if self.stem_s2d
                else CBL_(fo, 6, 2, 2, dt, ax, *fu))
        self.backbone = [
            stem,
            CBL_(fo * 2, 3, 2, 1, dt, ax, *fu),
            C3_(fo * 2, 0.5, d3, True, dt, ax, *fu),
            CBL_(fo * 4, 3, 2, 1, dt, ax, *fu),
            C3_(fo * 4, 0.5, d6, True, dt, ax, *fu),
            CBL_(fo * 8, 3, 2, 1, dt, ax, *fu),
            C3_(fo * 8, 0.5, d9, True, dt, ax, *fu),
            CBL_(fo * 16, 3, 2, 1, dt, ax, *fu),
            C3_(fo * 16, 0.5, d3, True, dt, ax, *fu),
            SPPF_(fo * 16, dt, ax, *fu),
        ]
        # Neck: FPN-up + PAN-down — reference model.py:197-207, 221-237.
        self.neck = [
            CBL_(fo * 8, 1, 1, 0, dt, ax, *fu),
            C3_(fo * 8, 0.25, d3, False, dt, ax, *fu),
            CBL_(fo * 4, 1, 1, 0, dt, ax, *fu),
            C3_(fo * 4, 0.25, d3, False, dt, ax, *fu),
            CBL_(fo * 4, 3, 2, 1, dt, ax, *fu),
            C3_(fo * 8, 0.5, d3, False, dt, ax, *fu),
            CBL_(fo * 8, 3, 2, 1, dt, ax, *fu),
            C3_(fo * 16, 0.5, d3, False, dt, ax, *fu),
        ]
        self.head = Head(nc=self.nc, dtype=dt)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        """x: (bs, H, W, 3) NHWC, H and W divisible by 32.

        Returns [P3, P4, P5] raw logits, each (bs, 3, H/S, W/S, 5+nc).
        """
        assert x.shape[1] % 32 == 0 and x.shape[2] % 32 == 0, \
            "H and W must be divisible by 32"
        x = x.astype(self.dtype)
        if self.stem_s2d:
            from yolov5m_tpu.models.s2d import space_to_depth2
            x = space_to_depth2(x)

        if self.quant_chain and self.quant:
            return self._forward_chain(x)

        taps = []
        for idx, layer in enumerate(self.backbone):
            x = layer(x, train)
            if idx in (4, 6):
                taps.append(x)

        feats = []
        stash = []
        for idx, layer in enumerate(self.neck):
            if idx in (0, 2):
                x = layer(x, train)
                stash.append(x)
                x = upsample2x_nearest(x)
                x = jnp.concatenate([x, taps.pop()], axis=-1)
            elif idx in (4, 6):
                x = layer(x, train)
                x = jnp.concatenate([x, stash.pop()], axis=-1)
            else:
                x = layer(x, train)
                if idx > 2:
                    feats.append(x)

        return self.head(feats)

    def _forward_chain(self, x):
        """int8-activation-chain inference graph: activations flow between
        blocks as (q int8, scale) pairs; concatenations stay UNMATERIALIZED
        as part lists (consumed by split convolutions, blocks.CBL.chain);
        nearest-2x upsample repeats the int8 codes; the only float
        activations are the three head inputs (dequantized once)."""
        from yolov5m_tpu.models.blocks import _deq

        taps = []
        for idx, layer in enumerate(self.backbone):
            x = layer(x, False)
            if idx in (4, 6):
                taps.append(x)

        feats = []
        stash = []
        for idx, layer in enumerate(self.neck):
            if idx in (0, 2):
                x = layer(x, False)
                stash.append(x)
                q, s = x
                x = [(upsample2x_nearest(q), s), taps.pop()]
            elif idx in (4, 6):
                x = layer(x, False)
                x = [x, stash.pop()]
            else:
                x = layer(x, False)
                if idx > 2:
                    feats.append(x)

        return self.head([_deq(f, self.dtype) for f in feats])


def create_model(cfg: Config):
    """Build model + anchors from a Config. Returns (module, anchors (nl,na,2))."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=dtype)
    return model, jnp.asarray(normalized_anchors())


def from_family(variant: str, nc: int = 80, dtype=jnp.float32,
                **kwargs) -> YOLOv5:
    """Build a YOLOv5 family member by name: n/s/m/l/x (see FAMILY)."""
    fo, dm = FAMILY[variant]
    return YOLOv5(first_out=fo, depth_mult=dm, nc=nc, dtype=dtype, **kwargs)


if __name__ == "__main__":
    # executable smoke block, reference model.py:242-268 parity: random batch
    # through the model, assert the 3 output shapes, print forward latency
    import time

    import jax

    batch_size, hw, nc = 2, 640, 80
    model = YOLOv5(first_out=48, nc=nc, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch_size, hw, hw, 3))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = jax.block_until_ready(fwd(variables, x))  # compile
    start = time.time()
    out = jax.block_until_ready(fwd(variables, x))
    end = time.time()

    assert out[0].shape == (batch_size, 3, hw // 8, hw // 8, nc + 5)
    assert out[1].shape == (batch_size, 3, hw // 16, hw // 16, nc + 5)
    assert out[2].shape == (batch_size, 3, hw // 32, hw // 32, nc + 5)
    print("Success!")
    print("feedforward took {:.4f} seconds".format(end - start))

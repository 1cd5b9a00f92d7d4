"""Space-to-depth stem rewrite.

The stem conv (6×6, stride 2, pad 2 on 3-channel input — reference
model.py:185) maps poorly onto the MXU: 3 input channels use 3/128 of the
systolic array. Because k=6 = 2·3, the identical math can be expressed as a
3×3 stride-1 conv over the 2×2 space-to-depth transform of the input
(12 channels):

  out(y,x) = Σ_{dy,dx<6} W6[dy,dx,c]·in(2y+dy−2, 2x+dx−2)
           = Σ_{a,b<3, p,q<2} W3[a,b,(p,q,c)]·z(y+a−1, x+b−1)
  with z(u,v)[(p,q,c)] = in(2u+p, 2v+q, c),
       W3[a,b,(p,q,c),o] = W6[2a+p, 2b+q, c, o].

Exact to float associativity. Enable with YOLOv5(stem_s2d=True) and convert
weights with stem_weights_to_s2d.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C), channel order (p, q, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)           # (b, h2, w2, p, q, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_kernel_to_s2d(w6: np.ndarray) -> np.ndarray:
    """(6, 6, C, O) HWIO stem kernel → (3, 3, 4C, O) for the s2d stem."""
    kh, kw, c, o = w6.shape
    assert kh == 6 and kw == 6
    w3 = np.zeros((3, 3, 4 * c, o), w6.dtype)
    for a in range(3):
        for b in range(3):
            for p in range(2):
                for q in range(2):
                    w3[a, b, (p * 2 + q) * c:(p * 2 + q + 1) * c] = \
                        w6[2 * a + p, 2 * b + q]
    return w3


def stem_weights_to_s2d(variables) -> dict:
    """Convert a standard model's variables for use with stem_s2d=True.
    Only backbone_0's conv kernel changes shape; everything else is shared.
    """
    import jax
    from flax import traverse_util

    out = {}
    for coll, tree in variables.items():
        flat = traverse_util.flatten_dict(tree)
        new = {}
        for path, v in flat.items():
            if path[:3] == ("backbone_0", "conv", "kernel"):
                new[path] = jnp.asarray(stem_kernel_to_s2d(np.asarray(v)))
            else:
                new[path] = v
        out[coll] = traverse_util.unflatten_dict(new)
    return out

"""Independent torch-functional YOLOv5 forward used as a numeric golden.

Interprets the reference's torch state-dict layout (reference model.py module
tree) directly with torch.nn.functional calls — no nn.Module classes — so it
is an independent cross-check of both the flax model topology and the weight
converter. CPU-only, eval mode.
"""

import torch
import torch.nn.functional as F


def _cbl(sd, p, x, stride, pad):
    x = F.conv2d(x, sd[f"{p}.cbl.0.weight"], stride=stride, padding=pad)
    x = F.batch_norm(
        x,
        sd[f"{p}.cbl.1.running_mean"],
        sd[f"{p}.cbl.1.running_var"],
        sd[f"{p}.cbl.1.weight"],
        sd[f"{p}.cbl.1.bias"],
        training=False,
        momentum=0.03,
        eps=1e-3,
    )
    return F.silu(x)


def _bottleneck(sd, p, x):
    y = _cbl(sd, f"{p}.c1", x, 1, 0)
    y = _cbl(sd, f"{p}.c2", y, 1, 1)
    return y + x


def _c3(sd, p, x, depth, backbone):
    y = _cbl(sd, f"{p}.c1", x, 1, 0)
    for j in range(depth):
        if backbone:
            y = _bottleneck(sd, f"{p}.seq.{j}", y)
        else:
            y = _cbl(sd, f"{p}.seq.{j}.0", y, 1, 0)
            y = _cbl(sd, f"{p}.seq.{j}.1", y, 1, 1)
    skip = _cbl(sd, f"{p}.c_skipped", x, 1, 0)
    return _cbl(sd, f"{p}.c_out", torch.cat([y, skip], 1), 1, 0)


def _sppf(sd, p, x):
    x = _cbl(sd, f"{p}.c1", x, 1, 0)
    p1 = F.max_pool2d(x, 5, 1, 2)
    p2 = F.max_pool2d(p1, 5, 1, 2)
    p3 = F.max_pool2d(p2, 5, 1, 2)
    return _cbl(sd, f"{p}.c_out", torch.cat([x, p1, p2, p3], 1), 1, 0)


# backbone module specs: (kind, stride, pad, kernel/depth)
_BACKBONE = [
    ("cbl", 2, 2), ("cbl", 2, 1),
    ("c3", 2), ("cbl", 2, 1),
    ("c3", 4), ("cbl", 2, 1),
    ("c3", 6), ("cbl", 2, 1),
    ("c3", 2), ("sppf",),
]


@torch.no_grad()
def yolov5_forward(sd, x, nc):
    """sd: torch-layout state dict (tensors). x: (bs,3,H,W). Returns 3 scales
    (bs,3,H/S,W/S,5+nc) like reference model.py:210-239."""
    sd = {k: torch.as_tensor(v) for k, v in sd.items()}
    taps = []
    for i, spec in enumerate(_BACKBONE):
        p = f"backbone.{i}"
        if spec[0] == "cbl":
            x = _cbl(sd, p, x, spec[1], spec[2])
        elif spec[0] == "c3":
            x = _c3(sd, p, x, spec[1], backbone=True)
        else:
            x = _sppf(sd, p, x)
        if i in (4, 6):
            taps.append(x)

    feats, stash = [], []
    for i in range(8):
        p = f"neck.{i}"
        if i in (0, 2):
            x = _cbl(sd, p, x, 1, 0)
            stash.append(x)
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = torch.cat([x, taps.pop()], 1)
        elif i in (4, 6):
            x = _cbl(sd, p, x, 2, 1)
            x = torch.cat([x, stash.pop()], 1)
        else:
            x = _c3(sd, p, x, 2, backbone=False)
            if i > 2:
                feats.append(x)

    outs = []
    for i, f in enumerate(feats):
        y = F.conv2d(f, sd[f"head.out_convs.{i}.weight"], sd[f"head.out_convs.{i}.bias"])
        bs, _, ny, nx = y.shape
        outs.append(y.view(bs, 3, 5 + nc, ny, nx).permute(0, 1, 3, 4, 2).contiguous())
    return outs

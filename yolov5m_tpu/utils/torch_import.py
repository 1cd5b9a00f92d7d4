"""Convert a PyTorch checkpoint of the reference model into this framework's
formats — replaces reference ultralytics_files/state_dict_loading.py.

Torch is used only here (host-side, CPU) to unpickle; the framework itself
never imports torch. Two outputs:
  * .npz of the torch-layout state dict (consumed by --load_coco_weights /
    detect --weights via models.weights.convert_torch_state_dict);
  * optional head-channel handling for class-count changes (drop head keys
    with --no-head, the reference's yolov5m_coco_nh.pt pattern,
    train.py:72-74).

Usage:
  python -m yolov5m_tpu.utils.torch_import yolov5m_coco.pt yolov5m_coco.npz [--no-head]
"""

from __future__ import annotations

import argparse

import numpy as np


def torch_checkpoint_to_npz(pt_path: str, npz_path: str,
                            drop_head: bool = False) -> int:
    """Load a torch .pt state dict and save as npz. Returns key count."""
    import torch  # local import: host-only dependency

    obj = torch.load(pt_path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:  # reference checkpoints
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):                      # whole-module pickle
        obj = obj.state_dict()

    out = {}
    for k, v in obj.items():
        if k.endswith("num_batches_tracked") or k == "head.anchors":
            continue
        if drop_head and k.startswith("head."):
            continue
        out[k] = v.detach().cpu().numpy().astype(np.float32)
    np.savez(npz_path, **out)
    return len(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pt_path")
    p.add_argument("npz_path")
    p.add_argument("--no-head", action="store_true",
                   help="drop head weights (fine-tune to a new class count)")
    args = p.parse_args()
    n = torch_checkpoint_to_npz(args.pt_path, args.npz_path, args.no_head)
    print(f"wrote {n} arrays to {args.npz_path}")


if __name__ == "__main__":
    main()

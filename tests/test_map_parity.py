"""Suite-pinned SYSTEM-level mAP parity vs the actual torch reference.

Small-sample version of benchmarks/map_parity.py (the committed 200-image
record lives in MAP_PARITY.md): identical flagship weights through BOTH
complete pipelines — reference forward → cells_to_bboxes → its NMS, vs our
fused apply → fused_detect — scored by eval/metrics.py against exact
synthetic labels. Pins the north-star acceptance criterion (|Δ mAP50| ≤
0.5) as an executable test, not just a committed table.

Wall cost ~1 min, dominated by the torch reference forward (first_out=48
@ 640² on CPU). The 200-image run measured Δ = +0.0014; this 8-image
version measured Δ = +0.017 — the assert bound (0.2) is 10× that
observation but 2.5× tighter than the acceptance band.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))


def test_system_level_map_parity_small_sample():
    torch = pytest.importorskip("torch")  # noqa: F841
    from map_parity import run_parity

    result = run_parity(n_images=8, bs=4, log=lambda *a, **k: None)

    # both systems actually detect (trained weights, in-distribution load)
    assert result["ours"]["mAP50"] > 0.5, result
    assert result["reference"]["mAP50"] > 0.5, result
    # north-star acceptance band, with margin
    assert abs(result["delta_mAP50"]) <= 0.2, result
    assert result["within_band"], result

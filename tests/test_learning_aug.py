"""Full-augmentation learning proof (VERDICT round-1 item #9).

Trains the same tiny model twice through the REAL BatchLoader on large-box
synthetic data — once plain, once with mosaic 0.75 + HSV — and evaluates on a
scale-shifted small-box val split. Mosaic is the only mechanism that shows
the model half-scale boxes, so this asserts the north-star "full augmentation
training" config (BASELINE.json configs[3]) actually *helps*, not merely
runs. Calibrated margins (CPU, 300 steps): plain mAP50 = 0.00, aug = 0.955.

This is the slowest test in the suite (~5 min warm); it earns it — it is the
only end-to-end evidence that the augmentation pipeline improves learning.
"""

import pytest

from tests.aug_learning_common import train_and_eval, write_dataset


@pytest.fixture(scope="module")
def aug_dataset(tmp_path_factory):
    return write_dataset(str(tmp_path_factory.mktemp("augdata")))


def test_mosaic_hsv_beats_plain_on_scale_shift(aug_dataset):
    plain, plain_loss = train_and_eval(aug_dataset, steps=400)
    aug, aug_loss = train_and_eval(aug_dataset, steps=400,
                                   mosaic_p=0.75, hsv=True)
    assert plain_loss > 0 and aug_loss > 0  # finite, ran
    # calibrated on CPU (400 steps): plain mAP50 ~0.0, aug 0.58-0.96 across
    # runs (XLA CPU scatter order is nondeterministic, so training diverges
    # run-to-run) — margins sit far below the observed aug floor and far
    # above the observed plain ceiling
    assert aug["map50"] >= plain["map50"] + 0.35, (aug, plain)
    assert aug["map50"] >= 0.45, aug
    assert aug["class_accuracy"] >= 0.85, aug

"""Guard against drift between the two copies of the native source.

`native/preprocess.cc` is the canonical source; the package carries a
byte-identical mirror at `yolov5m_tpu/_native_src/preprocess.cc` so a pip
wheel can still build the kernel outside a repo checkout (data/native.py
_NATIVE_CANDIDATES). Two checked-in copies drift silently — this test makes
the CI-visible contract "they are the same file" (round-4 review Weak #6).
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANONICAL = os.path.join(REPO, "native", "preprocess.cc")
MIRROR = os.path.join(REPO, "yolov5m_tpu", "_native_src", "preprocess.cc")


def test_native_mirror_is_byte_identical():
    with open(CANONICAL, "rb") as f:
        canonical = f.read()
    with open(MIRROR, "rb") as f:
        mirror = f.read()
    assert canonical == mirror, (
        "yolov5m_tpu/_native_src/preprocess.cc has drifted from the "
        "canonical native/preprocess.cc — edit native/ and copy it over "
        "(cp native/preprocess.cc yolov5m_tpu/_native_src/preprocess.cc)")


def test_native_makefiles_match():
    a = os.path.join(REPO, "native", "Makefile")
    b = os.path.join(REPO, "yolov5m_tpu", "_native_src", "Makefile")
    with open(a, "rb") as f, open(b, "rb") as g:
        assert f.read() == g.read(), (
            "packaged Makefile drifted from native/Makefile")

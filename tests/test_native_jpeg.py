"""Native libjpeg decode (native/preprocess.cc decode_jpeg_u8) vs PIL.

Both decode through libjpeg, so on a well-formed baseline JPEG the outputs
must agree exactly; grayscale files must come back as 3-channel RGB; corrupt
buffers must degrade to the PIL fallback (None), never crash the process
(the default libjpeg error handler exit()s — we trampoline out instead).
"""

import io

import numpy as np
import pytest
from PIL import Image

from yolov5m_tpu.data.native import decode_jpeg, load_image_rgb, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")


def _jpeg_bytes(arr, mode="RGB", quality=90):
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_decode_matches_pil(rng):
    arr = rng.integers(0, 255, (37, 53, 3), np.uint8)
    data = _jpeg_bytes(arr)
    ours = decode_jpeg(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours is not None and ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_grayscale_decodes_to_rgb(rng):
    arr = rng.integers(0, 255, (20, 31), np.uint8)
    data = _jpeg_bytes(arr, mode="L")
    ours = decode_jpeg(data)
    assert ours is not None and ours.shape == (20, 31, 3)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)


def test_corrupt_buffer_returns_none(rng):
    assert decode_jpeg(b"\xff\xd8 not actually a jpeg") is None
    assert decode_jpeg(b"PNG-ish junk") is None
    truncated = _jpeg_bytes(rng.integers(0, 255, (64, 64, 3), np.uint8))[:40]
    assert decode_jpeg(bytes(truncated)) is None


def test_load_image_rgb_jpeg_and_png(tmp_path, rng):
    arr = rng.integers(0, 255, (24, 24, 3), np.uint8)
    jp = tmp_path / "a.jpg"
    Image.fromarray(arr).save(jp, "JPEG", quality=95)
    out = load_image_rgb(str(jp))
    ref = np.asarray(Image.open(jp).convert("RGB"))
    np.testing.assert_array_equal(out, ref)

    pp = tmp_path / "b.png"
    Image.fromarray(arr).save(pp, "PNG")
    np.testing.assert_array_equal(load_image_rgb(str(pp)), arr)  # PIL path


def test_packaged_native_mirror_is_identical():
    """yolov5m_tpu/_native_src/* (what pip wheels ship) must stay
    byte-identical to the canonical /native sources it mirrors."""
    import os
    import yolov5m_tpu

    pkg = os.path.join(os.path.dirname(yolov5m_tpu.__file__), "_native_src")
    repo = os.path.join(os.path.dirname(os.path.dirname(yolov5m_tpu.__file__)),
                        "native")
    if not os.path.isdir(repo):
        pytest.skip("no repo checkout next to the package (pip install)")
    for name in ("preprocess.cc", "Makefile"):
        with open(os.path.join(pkg, name), "rb") as a, \
                open(os.path.join(repo, name), "rb") as b:
            assert a.read() == b.read(), f"{name} drifted from native/{name}"


def test_native_builds_into_cache_when_source_dir_readonly(monkeypatch,
                                                           tmp_path):
    """pip wheels land in read-only site-packages: the kernel must build
    into the per-user cache dir instead of failing (and still load)."""
    import os as _os
    import yolov5m_tpu.data.native as nat

    orig = (nat._lib, nat._lib_tried, nat._LIB_PATH)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setattr(_os, "access", lambda p, m: False)
    try:
        nat._lib, nat._lib_tried = None, False
        lib = nat._load_lib()
        assert nat._LIB_PATH.startswith(str(tmp_path))
        assert _os.path.isfile(nat._LIB_PATH)
        assert lib is not None, "kernel failed to build into the cache dir"
    finally:
        nat._lib, nat._lib_tried, nat._LIB_PATH = orig

"""ctypes bindings for the native preprocessing library (native/preprocess.cc).

The reference's host preprocessing rides OpenCV's C++ (cv2.resize at
reference utils/utils.py:87); this framework ships its own native kernels,
compiled on first use with g++ (no pip deps). Falls back to cv2, then to a
pure-numpy bilinear, so the pipeline always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# canonical source lives at {repo}/native; pip-installed wheels carry a
# test-pinned mirror inside the package (yolov5m_tpu/_native_src) so the
# kernel still builds from source outside a repo checkout
_NATIVE_CANDIDATES = (os.path.join(_REPO_ROOT, "native"),
                      os.path.join(_PKG_ROOT, "_native_src"))
_NATIVE_DIR = next((d for d in _NATIVE_CANDIDATES
                    if os.path.isfile(os.path.join(d, "preprocess.cc"))),
                   _NATIVE_CANDIDATES[0])
_LIB_PATH = os.path.join(_NATIVE_DIR, "libyolopreproc.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build_dir() -> str:
    """Where to build/load the .so: next to the source when writable (repo
    checkout), else a per-user cache dir (pip install into a read-only
    site-packages must not fail, and pip uninstall must not orphan a .so
    outside the wheel RECORD)."""
    if os.access(_NATIVE_DIR, os.W_OK):
        return _NATIVE_DIR
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "yolov5m_tpu", "native")
    os.makedirs(cache, exist_ok=True)
    return cache


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried, _LIB_PATH
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        # always (re)build from source when the .so is missing or older than
        # preprocess.cc — the binary is never version-controlled (gitignored),
        # so what loads is provably what the checked-in source produces
        build_dir = _build_dir()
        _LIB_PATH = os.path.join(build_dir, "libyolopreproc.so")
        src = os.path.join(_NATIVE_DIR, "preprocess.cc")
        stale = (not os.path.isfile(_LIB_PATH)
                 or (os.path.isfile(src)
                     and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
        if stale and os.path.isfile(os.path.join(_NATIVE_DIR, "Makefile")):
            # build to a per-process temp path + atomic rename: concurrent
            # processes (train + eval, parallel pytest) may race the
            # rebuild, and g++ -o writes the .so in place — a second
            # process could dlopen a half-written file
            tmp = f"{_LIB_PATH}.tmp.{os.getpid()}"
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-B",
                     f"TARGET={tmp}"],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, _LIB_PATH)
            finally:
                if os.path.isfile(tmp):
                    os.remove(tmp)
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_int, u8p, ctypes.c_int,
                                           ctypes.c_int]
        lib.letterbox_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, u8p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_uint8]
        lib.normalize_u8_to_f32.argtypes = [u8p, ctypes.POINTER(ctypes.c_float),
                                            ctypes.c_int64]
        ip = ctypes.POINTER(ctypes.c_int)
        lib.jpeg_dims.argtypes = [u8p, ctypes.c_int64, ip, ip]
        lib.jpeg_dims.restype = ctypes.c_int
        lib.decode_jpeg_u8.argtypes = [u8p, ctypes.c_int64, u8p,
                                       ctypes.c_int, ctypes.c_int]
        lib.decode_jpeg_u8.restype = ctypes.c_int
        _lib = lib
    except Exception as e:
        import warnings
        warnings.warn(
            f"native preprocessing kernel unavailable ({type(e).__name__}: "
            f"{e}); falling back to cv2/numpy (slower host data plane)")
        _lib = None
    return _lib


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize HWC uint8/float image to (w, h). INTER_LINEAR semantics
    (half-pixel centers), matching reference resize_image (utils/utils.py:85-87).
    """
    w, h = int(size_wh[0]), int(size_wh[1])
    if img.shape[0] == h and img.shape[1] == w:
        return img

    src_u8 = np.ascontiguousarray(img).astype(np.uint8, copy=False) \
        if img.dtype != np.uint8 else np.ascontiguousarray(img)

    lib = _load_lib()
    if lib is not None and img.ndim == 3:
        dst = np.empty((h, w, img.shape[2]), np.uint8)
        lib.resize_bilinear_u8(_as_u8p(src_u8), img.shape[0], img.shape[1],
                               img.shape[2], _as_u8p(dst), h, w)
        return dst.astype(img.dtype, copy=False)

    try:
        import cv2
        return cv2.resize(src_u8, dsize=(w, h),
                          interpolation=cv2.INTER_LINEAR).astype(img.dtype, copy=False)
    except ImportError:
        pass

    # numpy fallback: half-pixel-center bilinear
    sh, sw = img.shape[:2]
    fy = np.clip((np.arange(h) + 0.5) * sh / h - 0.5, 0, sh - 1)
    fx = np.clip((np.arange(w) + 0.5) * sw / w - 0.5, 0, sw - 1)
    y0 = fy.astype(int); y1 = np.minimum(y0 + 1, sh - 1)
    x0 = fx.astype(int); x1 = np.minimum(x0 + 1, sw - 1)
    ty = (fy - y0)[:, None, None]
    tx = (fx - x0)[None, :, None]
    f = src_u8.astype(np.float32)
    grayscale = f.ndim == 2          # letterbox supports (h, w) images too
    if grayscale:
        f = f[..., None]             # the [:, None, None] weights need HWC
    top = f[y0][:, x0] * (1 - tx) + f[y0][:, x1] * tx
    bot = f[y1][:, x0] * (1 - tx) + f[y1][:, x1] * tx
    out = top * (1 - ty) + bot * ty
    if grayscale:
        out = out[..., 0]
    return (out + 0.5).astype(np.uint8).astype(img.dtype, copy=False)


def letterbox(img: np.ndarray, new_hw: Tuple[int, int], fill: int = 114,
              stride: int = 32, scaleup: bool = True):
    """Resize keeping aspect + pad to new_hw. Same geometry as reference
    utils/utils.py:119-149 with auto=False (exact target shape).

    Returns (image, ratio, (dw, dh)) like the reference.
    """
    sh, sw = img.shape[:2]
    nh, nw = new_hw
    r = min(nh / sh, nw / sw)
    if not scaleup:
        r = min(r, 1.0)
    uw, uh = int(round(sw * r)), int(round(sh * r))
    dw, dh = (nw - uw) / 2, (nh - uh) / 2
    resized = resize_bilinear(img, (uw, uh))
    top = int(round(dh - 0.1))
    left = int(round(dw - 0.1))

    lib = _load_lib()
    src_u8 = resized.astype(np.uint8, copy=False)
    if lib is not None and img.ndim == 3:
        dst = np.empty((nh, nw, img.shape[2]), np.uint8)
        lib.letterbox_u8(_as_u8p(np.ascontiguousarray(src_u8)), uh, uw,
                         img.shape[2], _as_u8p(dst), nh, nw, top, left,
                         fill)
        return dst.astype(img.dtype, copy=False), (r, r), (dw, dh)

    dst = np.full((nh, nw) + img.shape[2:], fill, dtype=np.uint8)
    dst[top:top + uh, left:left + uw] = src_u8
    return dst.astype(img.dtype, copy=False), (r, r), (dw, dh)


def decode_jpeg(path_or_bytes) -> Optional[np.ndarray]:
    """Decode a JPEG to (h, w, 3) RGB uint8 with the native libjpeg kernel
    (no GIL held during decode — loader threads parallelize for real, unlike
    PIL's Python-level open/convert). Returns None when the native lib is
    unavailable or the buffer isn't a decodable JPEG; callers fall back to
    PIL (non-JPEG formats always take the fallback)."""
    lib = _load_lib()
    if lib is None:
        return None
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = np.frombuffer(path_or_bytes, np.uint8)
    else:
        try:
            buf = np.fromfile(path_or_bytes, np.uint8)
        except OSError:
            return None
    if buf.size < 3 or buf[0] != 0xFF or buf[1] != 0xD8:   # SOI marker
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jpeg_dims(_as_u8p(buf), buf.size, ctypes.byref(h),
                     ctypes.byref(w)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.decode_jpeg_u8(_as_u8p(buf), buf.size, _as_u8p(out), h.value,
                          w.value):
        return None
    return out


def load_image_rgb(path: str) -> np.ndarray:
    """(h, w, 3) RGB uint8 from disk: native libjpeg fast path for JPEGs,
    PIL for everything else (replaces the reference's PIL-everywhere load,
    reference dataset.py:88)."""
    img = decode_jpeg(path)
    if img is not None:
        return img
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def native_available() -> bool:
    return _load_lib() is not None

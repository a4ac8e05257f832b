"""ctypes binding to the system libwebp (when present) — the FOREIGN
VP8 implementation used two ways:

1. Fixture writer + decode ORACLE for the pure-python vp8_codec:
   tools/make_lossy_webp_fixtures.py encodes deterministic arrays with
   libwebp and records libwebp's OWN decoded YUV planes as goldens;
   tests require vp8_codec to reproduce them bit-for-bit. This is
   independent-implementation equality — stronger than the
   same-author spec-transcribed writers the other codecs pin against.
2. Native decode fast path for lossy WebP (images.decode_image_pure
   stays the reference; decode_bench times both), mirroring the
   PIL fast path added in r11.

Import-safe everywhere: ``HAVE_LIBWEBP`` is False when the shared
library is absent and every entry point raises cleanly.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)

_lib = None
try:  # pragma: no cover - environment-dependent
    _name = ctypes.util.find_library("webp") or "libwebp.so.7"
    _lib = ctypes.CDLL(_name)
    _lib.WebPEncodeRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    _lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib.WebPFree.restype = None
    _lib.WebPFree.argtypes = [ctypes.c_void_p]
except OSError:  # pragma: no cover
    _lib = None

HAVE_LIBWEBP = _lib is not None


def _require():
    if _lib is None:  # pragma: no cover
        raise NotImplementedError("libwebp not available on this host")


def encode_rgb(arr: np.ndarray, quality: float) -> bytes:
    """HxWx3 uint8 -> lossy WebP bytes via libwebp."""
    _require()
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _lib.WebPEncodeRGB(
        arr.tobytes(), w, h, w * 3, float(quality), ctypes.byref(out)
    )
    if not n:
        raise ValueError("WebPEncodeRGB failed")
    data = ctypes.string_at(out, n)
    _lib.WebPFree(out)
    return data


def encode_rgba(arr: np.ndarray, quality: float) -> bytes:
    """HxWx4 uint8 -> lossy WebP bytes (VP8X + ALPH + VP8 when alpha
    is non-trivial) via libwebp."""
    _require()
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _lib.WebPEncodeRGBA(
        arr.tobytes(), w, h, w * 4, float(quality), ctypes.byref(out)
    )
    if not n:
        raise ValueError("WebPEncodeRGBA failed")
    data = ctypes.string_at(out, n)
    _lib.WebPFree(out)
    return data


def decode_rgba(payload: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 4) uint8 RGBA, libwebp's output (lossy RGB
    channels go through libwebp's fancy upsampler — use the ALPHA
    channel as ground truth; color parity is pinned at YUV level)."""
    _require()
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _lib.WebPDecodeRGBA(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h)
    )
    if not p:
        raise ValueError("WebPDecodeRGBA failed")
    out = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    _lib.WebPFree(p)
    return out


def decode_yuv(payload: bytes):
    """WebP bytes -> (Y, U, V) uint8 planes, libwebp's exact output."""
    _require()
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = _lib.WebPDecodeYUV(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not yp:
        raise ValueError("WebPDecodeYUV failed")
    H, W = h.value, w.value
    cH, cW = (H + 1) >> 1, (W + 1) >> 1
    Y = np.ctypeslib.as_array(yp, shape=(H, stride.value))[:, :W].copy()
    U = np.ctypeslib.as_array(u, shape=(cH, uv_stride.value))[:, :cW].copy()
    V = np.ctypeslib.as_array(v, shape=(cH, uv_stride.value))[:, :cW].copy()
    _lib.WebPFree(yp)
    return Y, U, V


def decode_rgb_via_yuv(payload: bytes) -> np.ndarray:
    """Native fast path with PURE-PATH-IDENTICAL output: libwebp
    decodes to YUV, the shared yuv_to_rgb converts — so fast == pure
    exactly on keyframes (libwebp's own RGB surface would differ by
    its fancy upsampler, which is presentation, not VP8 semantics)."""
    from a3_fp_bigdata_spark.multimodal.vp8_codec import yuv_to_rgb

    return yuv_to_rgb(*decode_yuv(payload))

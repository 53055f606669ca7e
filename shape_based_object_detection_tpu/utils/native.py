"""ctypes loader for the native C++ eval kernel (csrc/ap_matcher.cpp).

Builds the shared library on first use with g++ (cached next to the source;
no pybind11 needed — plain C ABI). Falls back gracefully: callers check
``load_ap_matcher() is not None`` and use the pure-Python path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_SO = os.path.join(_CSRC, "libap_matcher.so")


def _build_lib(src_name: str, so_path: str, extra: tuple = ()) -> bool:
    src = os.path.join(_CSRC, src_name)
    if not os.path.exists(src):
        return False
    if os.path.exists(so_path) and (
            os.path.getmtime(so_path) >= os.path.getmtime(src)):
        return True
    # Compile to a per-process temp path and atomically rename: concurrent
    # builders (e.g. grain worker processes all importing on a cold tree)
    # must never dlopen a half-written .so.
    tmp = f"{so_path}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", tmp, src, *extra],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        # another process may have won the race with a good build
        return os.path.exists(so_path) and (
            os.path.getmtime(so_path) >= os.path.getmtime(src))
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _build() -> bool:
    return _build_lib("ap_matcher.cpp", _SO)


def load_ap_matcher() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.sbd_match_class_full.restype = None
        lib.sbd_match_class_full.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            u8p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            u8p, u8p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            u8p, u8p,
        ]
        lib.sbd_match_class_strata.restype = None
        lib.sbd_match_class_strata.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            u8p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            u8p, u8p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            u8p, u8p,
        ]
        _LIB = lib
        return _LIB


def match_class_native(
    det_boxes: np.ndarray,  # (N, 4) float32, score-sorted desc
    det_img_ids: np.ndarray,  # (N,) int32
    det_oob: np.ndarray,  # (N,) uint8: det outside the eval area range
    gt_boxes: np.ndarray,  # (M, 4) float32
    gt_img_ids: np.ndarray,  # (M,) int32
    gt_crowd: np.ndarray,  # (M,) uint8
    gt_ignore: np.ndarray,  # (M,) uint8 (crowd and/or out-of-area)
    thresholds: np.ndarray,  # (T,) float32
) -> Optional[tuple]:
    """Returns ((T, N) uint8 tp, (T, N) uint8 ignore) matrices, or None if
    the library is unavailable. Semantics: eval/ap.py::_match_class."""
    lib = load_ap_matcher()
    if lib is None:
        return None
    det_boxes = np.ascontiguousarray(det_boxes, np.float32)
    det_img_ids = np.ascontiguousarray(det_img_ids, np.int32)
    det_oob = np.ascontiguousarray(det_oob, np.uint8)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float32)
    gt_img_ids = np.ascontiguousarray(gt_img_ids, np.int32)
    gt_crowd = np.ascontiguousarray(gt_crowd, np.uint8)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    thresholds = np.ascontiguousarray(thresholds, np.float32)
    n, m, t = len(det_img_ids), len(gt_img_ids), len(thresholds)
    tp = np.zeros((t, n), np.uint8)
    ig = np.zeros((t, n), np.uint8)
    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    uptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.sbd_match_class_full(
        fptr(det_boxes), iptr(det_img_ids), uptr(det_oob), n,
        fptr(gt_boxes), iptr(gt_img_ids), uptr(gt_crowd), uptr(gt_ignore), m,
        fptr(thresholds), t,
        uptr(tp), uptr(ig),
    )
    return tp, ig


def match_class_strata_native(
    det_boxes: np.ndarray,  # (N, 4) float32, score-sorted desc
    det_img_ids: np.ndarray,  # (N,) int32
    det_oob: np.ndarray,  # (K, N) uint8: det outside stratum k's area range
    gt_boxes: np.ndarray,  # (M, 4) float32
    gt_img_ids: np.ndarray,  # (M,) int32
    gt_crowd: np.ndarray,  # (M,) uint8
    gt_ignore: np.ndarray,  # (K, M) uint8 per-stratum ignore flags
    thresholds: np.ndarray,  # (T,) float32
) -> Optional[tuple]:
    """All area strata of one class in ONE native call (IoUs, GT grouping,
    and marshaling amortized across strata). Returns ((K, T, N) uint8 tp,
    (K, T, N) uint8 ignore) or None if the library is unavailable."""
    lib = load_ap_matcher()
    if lib is None:
        return None
    det_boxes = np.ascontiguousarray(det_boxes, np.float32)
    det_img_ids = np.ascontiguousarray(det_img_ids, np.int32)
    det_oob = np.ascontiguousarray(det_oob, np.uint8)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float32)
    gt_img_ids = np.ascontiguousarray(gt_img_ids, np.int32)
    gt_crowd = np.ascontiguousarray(gt_crowd, np.uint8)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    thresholds = np.ascontiguousarray(thresholds, np.float32)
    k = det_oob.shape[0]
    n, m, t = len(det_img_ids), len(gt_img_ids), len(thresholds)
    assert gt_ignore.shape == (k, m), (gt_ignore.shape, (k, m))
    tp = np.zeros((k, t, n), np.uint8)
    ig = np.zeros((k, t, n), np.uint8)
    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    uptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.sbd_match_class_strata(
        fptr(det_boxes), iptr(det_img_ids), uptr(det_oob), n,
        fptr(gt_boxes), iptr(gt_img_ids), uptr(gt_crowd), uptr(gt_ignore), m,
        k, fptr(thresholds), t,
        uptr(tp), uptr(ig),
    )
    return tp, ig


# ---------------------------------------------------------------------------
# Fused JPEG decode + resize (csrc/jpeg_decoder.cpp). TPU-native equivalent
# of the reference family's PIL/libjpeg host path (SURVEY.md §2 native-deps
# table): DCT-domain prescale + triangle resample in one C call, released-GIL
# so the Loader's thread pool gets real decode parallelism.

_IMG_LOCK = threading.Lock()
_IMG_LIB: Optional[ctypes.CDLL] = None
_IMG_TRIED = False
_IMG_SO = os.path.join(_CSRC, "libsbd_image.so")


def load_image_lib() -> Optional[ctypes.CDLL]:
    global _IMG_LIB, _IMG_TRIED
    with _IMG_LOCK:
        if _IMG_TRIED:
            return _IMG_LIB
        _IMG_TRIED = True
        if not _build_lib("jpeg_decoder.cpp", _IMG_SO, ("-ljpeg",)):
            return None
        try:
            lib = ctypes.CDLL(_IMG_SO)
        except OSError:
            return None
        lib.sbd_decode_jpeg_resize.restype = ctypes.c_int
        lib.sbd_decode_jpeg_resize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _IMG_LIB = lib
        return _IMG_LIB


def decode_jpeg_resize_native(
    data: bytes, out_size: int, letterbox: bool
) -> Optional[tuple]:
    """Fused JPEG decode + resize -> ((S, S, 3) uint8, orig_h, orig_w), or
    None when the library is unavailable or the bytes don't decode (caller
    falls back to the PIL path). Semantics match the PIL path in
    utils/image.py: square BILINEAR resize, or letterbox_image_host's
    top-left content + zero bottom/right padding."""
    lib = load_image_lib()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, 3), np.uint8)
    ow = ctypes.c_int32(0)
    oh = ctypes.c_int32(0)
    # zero-copy: the C side only reads, so pass the immutable bytes object
    # directly instead of memcpy'ing every compressed file on the hot path
    buf = ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8))
    rc = lib.sbd_decode_jpeg_resize(
        buf,
        len(data), out_size, 1 if letterbox else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(ow), ctypes.byref(oh),
    )
    if rc != 0:
        return None
    return out, int(oh.value), int(ow.value)

"""ctypes bindings to the native host library (``csrc/libnndet_host.so``).

Auto-builds the library with ``make`` on first import if a compiler is
available; all entry points transparently fall back to the NumPy
implementations otherwise, so the package never hard-depends on the native
build (the reference's CPU fallback philosophy,
``/root/reference/nndet/core/boxes/nms.py:31-53``).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libnndet_host.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and (_CSRC / "Makefile").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC)], check=True, capture_output=True, timeout=120
            )
        except Exception:  # noqa: BLE001
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i64 = ctypes.POINTER(ctypes.c_int64)
    c_u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.iou_matrix_3d.argtypes = [c_d, ctypes.c_int64, c_d, ctypes.c_int64, c_d]
    lib.nms_3d.argtypes = [c_d, c_d, ctypes.c_int64, ctypes.c_double, c_i64]
    lib.nms_3d.restype = ctypes.c_int64
    lib.wbc_3d.argtypes = [
        c_d, c_d, c_d, c_d, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, c_d, c_d,
    ]
    lib.wbc_3d.restype = ctypes.c_int64
    lib.coco_match.argtypes = [
        c_d, ctypes.c_int64, ctypes.c_int64, c_u8, c_d, ctypes.c_int64,
        c_d, c_d, c_d,
    ]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype=ctypes.c_double):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


HAS_NATIVE = _load() is not None


def iou_matrix_native(boxes1: np.ndarray, boxes2: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or boxes1.shape[-1] != 6:
        return None
    b1 = np.ascontiguousarray(boxes1, dtype=np.float64)
    b2 = np.ascontiguousarray(boxes2, dtype=np.float64)
    out = np.empty((len(b1), len(b2)), dtype=np.float64)
    lib.iou_matrix_3d(_ptr(b1), len(b1), _ptr(b2), len(b2), _ptr(out))
    return out


def nms_native(
    boxes: np.ndarray, scores: np.ndarray, iou_threshold: float
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or boxes.shape[-1] != 6 or len(boxes) == 0:
        return None
    b = np.ascontiguousarray(boxes, dtype=np.float64)
    s = np.ascontiguousarray(scores, dtype=np.float64)
    keep = np.empty(len(b), dtype=np.int64)
    n = lib.nms_3d(_ptr(b), _ptr(s), len(b), float(iou_threshold),
                   _ptr(keep, ctypes.c_int64))
    return keep[:n].copy()


def wbc_native(
    boxes: np.ndarray,
    scores: np.ndarray,
    weights: np.ndarray,
    n_exp_preds: np.ndarray,
    iou_thresh: float,
    score_thresh: float = 0.0,
    use_area: bool = False,
    missing_weight: float = 1.0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None or boxes.shape[-1] != 6:
        return None
    if len(boxes) == 0:
        return np.zeros((0, 6)), np.zeros((0,))
    b = np.ascontiguousarray(boxes, dtype=np.float64)
    s = np.ascontiguousarray(scores, dtype=np.float64)
    w = np.ascontiguousarray(weights, dtype=np.float64)
    ne = np.ascontiguousarray(n_exp_preds, dtype=np.float64)
    ob = np.empty_like(b)
    os_ = np.empty_like(s)
    n = lib.wbc_3d(
        _ptr(b), _ptr(s), _ptr(w), _ptr(ne), len(b),
        float(iou_thresh), float(score_thresh), float(missing_weight),
        int(use_area), _ptr(ob), _ptr(os_),
    )
    return ob[:n].copy(), os_[:n].copy()


def coco_match_native(
    ious: np.ndarray, gt_ignore: np.ndarray, thresholds: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    iou = np.ascontiguousarray(ious, dtype=np.float64)
    gi = np.ascontiguousarray(gt_ignore, dtype=np.uint8)
    th = np.ascontiguousarray(thresholds, dtype=np.float64)
    n_pred, n_gt = iou.shape
    n_thr = len(th)
    dtm = np.empty((n_thr, n_pred), dtype=np.float64)
    gtm = np.empty((n_thr, n_gt), dtype=np.float64)
    dti = np.empty((n_thr, n_pred), dtype=np.float64)
    lib.coco_match(
        _ptr(iou), n_pred, n_gt, _ptr(gi, ctypes.c_uint8), _ptr(th), n_thr,
        _ptr(dtm), _ptr(gtm), _ptr(dti),
    )
    return dtm, gtm, dti

"""ctypes bindings for the native host library (cpp/build/libhyt_host.so)."""
from __future__ import annotations

import ctypes
import os
import sys
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                 "cpp", "build", "libhyt_host.so"),
    "libhyt_host.so",
]

_lib = None
_build_attempted = False


def build_library(timeout_s: int = 300) -> bool:
    """Best-effort in-tree build of cpp/ (cmake -G Ninja + ninja).

    Lets a fresh checkout get native coverage without a manual build step
    (the round-3 review found 6/7 suite skips were just the missing
    cpp/build). No-op when the toolchain is absent or the build fails;
    HYT_NO_CPP_BUILD=1 disables. Returns True if the library exists after.
    """
    global _build_attempted
    if _build_attempted or os.environ.get("HYT_NO_CPP_BUILD") == "1":
        return os.path.exists(_LIB_PATHS[0])
    _build_attempted = True
    import shutil
    import subprocess

    src = os.path.dirname(_LIB_PATHS[0])  # .../cpp/build
    src = os.path.dirname(src)            # .../cpp
    if not os.path.exists(os.path.join(src, "CMakeLists.txt")):
        return False
    if not (shutil.which("cmake") and shutil.which("ninja")):
        return False
    # Serialize concurrent first-use builds (e.g. pytest-xdist workers)
    # with an flock; the loser of the race finds the library built.
    lock_path = os.path.join(src, ".build.lock")
    try:
        import fcntl

        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if os.path.exists(_LIB_PATHS[0]):
                return True
            print("hamer_yolo_tpu: building native C++ library (first "
                  "use; cmake+ninja, may take a few minutes)...",
                  file=sys.stderr, flush=True)
            subprocess.run(["cmake", "-B", os.path.join(src, "build"),
                            "-S", src, "-G", "Ninja"], check=True,
                           capture_output=True, timeout=timeout_s)
            subprocess.run(["ninja", "-C", os.path.join(src, "build")],
                           check=True, capture_output=True,
                           timeout=timeout_s)
    except subprocess.CalledProcessError as e:
        tail = (e.stderr or b"").decode(errors="replace")[-2000:]
        print(f"hamer_yolo_tpu: native build failed ({e.cmd[0]}); "
              f"stderr tail:\n{tail}", file=sys.stderr, flush=True)
        return False
    except Exception:
        return False
    return os.path.exists(_LIB_PATHS[0])


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATHS[0]):
        build_library()
    for p in _LIB_PATHS:
        if os.path.exists(p) or "/" not in p:
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.hyt_letterbox.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, f32p, f32p, f32p, f32p]
            lib.hyt_crop_bilinear.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                              ctypes.c_float, ctypes.c_float,
                                              ctypes.c_float, ctypes.c_int, f32p]
            lib.hyt_normalize.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p, f32p]
            lib.hyt_nms.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_float, ctypes.c_float, ctypes.c_int,
                                    ctypes.c_int, f32p]
            lib.hyt_nms.restype = ctypes.c_int
            _lib = lib
            return lib
    return None


def available() -> bool:
    return load_library() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def letterbox(img_u8: np.ndarray, out_size: int = 640) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    lib = load_library()
    h, w = img_u8.shape[:2]
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    out = np.empty((out_size, out_size, 3), np.float32)
    r = ctypes.c_float()
    dw = ctypes.c_float()
    dh = ctypes.c_float()
    lib.hyt_letterbox(img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      h, w, out_size, _fp(out), ctypes.byref(r),
                      ctypes.byref(dw), ctypes.byref(dh))
    return out, float(r.value), (float(dw.value), float(dh.value))


def crop_bilinear(img_f32: np.ndarray, cx: float, cy: float, size: float,
                  out_size: int) -> np.ndarray:
    lib = load_library()
    h, w = img_f32.shape[:2]
    img_f32 = np.ascontiguousarray(img_f32, np.float32)
    out = np.empty((out_size, out_size, 3), np.float32)
    lib.hyt_crop_bilinear(_fp(img_f32), h, w, cx, cy, size, out_size, _fp(out))
    return out


def normalize(img_f32: np.ndarray, mean, std) -> np.ndarray:
    lib = load_library()
    img = np.ascontiguousarray(img_f32, np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib.hyt_normalize(_fp(img), img.shape[0], img.shape[1], _fp(mean), _fp(std))
    return img


def nms(pred: np.ndarray, conf_thres: float = 0.25, iou_thres: float = 0.45,
        agnostic: bool = False, max_det: int = 300) -> np.ndarray:
    """pred: (N, 5+nc) decoded rows -> (kept, 6) [x1 y1 x2 y2 score cls]."""
    lib = load_library()
    pred = np.ascontiguousarray(pred, np.float32)
    n, no = pred.shape
    out = np.empty((max_det, 6), np.float32)
    kept = lib.hyt_nms(_fp(pred), n, no - 5, conf_thres, iou_thres,
                       int(agnostic), max_det, _fp(out))
    return out[:kept]

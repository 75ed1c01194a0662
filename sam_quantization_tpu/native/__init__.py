"""Native (C++) host-runtime bindings with automatic build + numpy fallback.

The TPU compute path is JAX/XLA/Pallas; this package provides C++
implementations of the host-side runtime ops around it (RLE codec, NMS,
exact EDT, weight packing) — the counterparts of what the reference
delegates to torchvision/cv2 native kernels. Loaded through ctypes; built
on demand with g++ into ``build/libsamq_runtime.so``. Every entry point has
a numpy fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "samq_runtime.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libsamq_runtime.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        "-pthread", _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        print(f"[samq.native] build failed, using numpy fallbacks: {e}", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:  # pragma: no cover
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.rle_encode.restype = ctypes.c_int64
        lib.rle_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64]
        lib.rle_encode_batch.restype = ctypes.c_int64
        lib.rle_encode_batch.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p,
            ctypes.c_int64, i64p, ctypes.c_int64,
        ]
        if hasattr(lib, "rle_encode_batch_packed"):
            lib.rle_encode_batch_packed.restype = ctypes.c_int64
            lib.rle_encode_batch_packed.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p,
                ctypes.c_int64, i64p, ctypes.c_int64,
            ]
        lib.rle_decode.restype = None
        lib.rle_decode.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.rle_area.restype = ctypes.c_int64
        lib.rle_area.argtypes = [i64p, ctypes.c_int64]
        lib.box_nms.restype = ctypes.c_int64
        lib.box_nms.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_float, i64p]
        lib.distance_transform_edt.restype = None
        lib.distance_transform_edt.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, f32p]
        lib.pack_block_planar.restype = None
        lib.pack_block_planar.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int, i32p,
        ]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def rle_encode(mask: np.ndarray) -> list:
    """(H, W) binary → COCO uncompressed counts (column-major runs)."""
    lib = get_lib()
    h, w = mask.shape
    m = np.ascontiguousarray(mask, np.uint8)
    if lib is None:
        from sam_quantization_tpu.utils import amg

        return amg.mask_to_rle(m)["counts"]
    cap = h * w + 2
    out = np.empty(cap, np.int64)
    n = lib.rle_encode(_ptr(m, ctypes.c_uint8), h, w, _ptr(out, ctypes.c_int64), cap)
    assert n > 0
    return out[:n].tolist()


def rle_encode_batch(masks: np.ndarray) -> list:
    """(N, H, W) binary → list of COCO uncompressed counts lists.

    Threaded C++ batch path (csrc rle_encode_batch): the AMG host loop
    encodes points_per_batch*3 full-res masks per device batch, and the
    serial per-mask encode was the dominant AMG stage (tools/amg_bench.py
    round 4: 518 ms/batch at ViT-B 1024², single-threaded column-major).
    """
    lib = get_lib()
    masks = np.ascontiguousarray(masks, np.uint8)
    if masks.ndim != 3:
        raise ValueError(f"expected (N, H, W) masks, got {masks.shape}")
    n, h, w = masks.shape
    if lib is None or n == 0:
        return [rle_encode(m) for m in masks]
    # Small per-mask capacity + retry: the worst case (h*w+2 counts) would
    # mean a multi-GB output buffer for an AMG batch, and allocating it
    # costs more than the encode (measured 6x slower). Real masks have few
    # runs; pathological ones overflow (len < 0) and re-encode singly.
    cap = 8192
    out = np.empty((n, cap), np.int64)
    lens = np.empty(n, np.int64)
    try:
        rc = lib.rle_encode_batch(
            _ptr(masks, ctypes.c_uint8), n, h, w, _ptr(out, ctypes.c_int64),
            cap, _ptr(lens, ctypes.c_int64), 0,
        )
        if rc not in (0, -1):
            raise RuntimeError(f"rle_encode_batch returned rc={rc}")
    except Exception as e:  # ABI drift / stale .so: fall back per-mask
        print(
            f"[samq.native] rle_encode_batch failed ({e}); falling back to "
            f"per-mask encode (rebuild build/libsamq_runtime.so)",
            file=sys.stderr,
        )
        return [rle_encode(m) for m in masks]
    return [
        out[i, : lens[i]].tolist() if lens[i] >= 0 else rle_encode(masks[i])
        for i in range(n)
    ]


def rle_encode_batch_packed(packed: np.ndarray, h: int, w: int) -> list:
    """Bit-packed batched RLE: ``packed`` is (N, W, ceil(H/8)) uint8 from
    :func:`sam_quantization_tpu.utils.amg.packbits_masks` — the column-major
    bit stream, packed ON DEVICE so the host transfer is 8x smaller than the
    bool mask batch (the dominant real AMG cost, tools/amg_bench.py). The
    C++ consumer scans runs straight off the packed bytes
    (csrc rle_encode_batch_packed); no unpacked mask is materialized.
    """
    packed = np.ascontiguousarray(packed, np.uint8)
    if packed.ndim != 3 or packed.shape[2] != (h + 7) // 8 or packed.shape[1] != w:
        raise ValueError(
            f"expected (N, {w}, {(h + 7) // 8}) packed masks, got {packed.shape}"
        )
    n = packed.shape[0]
    lib = get_lib()
    if n == 0:
        return []
    if lib is None or not hasattr(lib, "rle_encode_batch_packed"):
        # numpy fallback: unpack to bool and take the unpacked path
        bits = np.unpackbits(packed, axis=-1, bitorder="little", count=h)
        return rle_encode_batch(bits.transpose(0, 2, 1))
    cap = 8192
    out = np.empty((n, cap), np.int64)
    lens = np.empty(n, np.int64)
    try:
        rc = lib.rle_encode_batch_packed(
            _ptr(packed, ctypes.c_uint8), n, h, w, _ptr(out, ctypes.c_int64),
            cap, _ptr(lens, ctypes.c_int64), 0,
        )
        if rc not in (0, -1):
            raise RuntimeError(f"rle_encode_batch_packed returned rc={rc}")
    except Exception as e:
        print(
            f"[samq.native] rle_encode_batch_packed failed ({e}); unpacking "
            f"on host instead",
            file=sys.stderr,
        )
        bits = np.unpackbits(packed, axis=-1, bitorder="little", count=h)
        return rle_encode_batch(bits.transpose(0, 2, 1))
    results = []
    for i in range(n):
        if lens[i] >= 0:
            results.append(out[i, : lens[i]].tolist())
        else:  # pathological run count: unpack this one mask
            bits = np.unpackbits(
                packed[i], axis=-1, bitorder="little", count=h
            ).T
            results.append(rle_encode(bits))
    return results


def rle_decode(counts, h: int, w: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from sam_quantization_tpu.utils import amg

        return amg.rle_to_mask({"size": [h, w], "counts": list(counts)})
    c = np.ascontiguousarray(counts, np.int64)
    out = np.empty((h, w), np.uint8)
    lib.rle_decode(_ptr(c, ctypes.c_int64), len(c), h, w, _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from sam_quantization_tpu.utils import amg

        return amg.box_nms(boxes, scores, iou_threshold)
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(b), np.int64)
    n = lib.box_nms(
        _ptr(b, ctypes.c_float), _ptr(s, ctypes.c_float), len(b),
        ctypes.c_float(iou_threshold), _ptr(keep, ctypes.c_int64),
    )
    return keep[:n]


def distance_transform_edt(mask: np.ndarray) -> np.ndarray:
    lib = get_lib()
    m = np.ascontiguousarray(mask, np.uint8)
    if lib is None:
        from scipy import ndimage

        return ndimage.distance_transform_edt(m)
    h, w = m.shape
    out = np.empty((h, w), np.float32)
    lib.distance_transform_edt(_ptr(m, ctypes.c_uint8), h, w, _ptr(out, ctypes.c_float))
    return out


def pack_block_planar(w_int: np.ndarray, bits: int, pack_block: int) -> np.ndarray:
    lib = get_lib()
    K, N = w_int.shape
    per = 32 // bits
    wi = np.ascontiguousarray(w_int, np.int32)
    if lib is None:
        return None  # caller uses the jnp path
    out = np.zeros((K // per, N), np.int32)
    lib.pack_block_planar(
        _ptr(wi, ctypes.c_int32), K, N, bits, pack_block, _ptr(out, ctypes.c_int32)
    )
    return out

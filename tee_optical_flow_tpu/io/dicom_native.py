"""ctypes bindings for the native dicomlite parser (native/dicomlite.cpp).

The accelerated host-side decode path (the role GDCM's C++ plays for the
reference). ``native_read`` returns (metadata dict, raw pixel array) or
None when the library is unavailable or the transfer syntax needs the
pure-Python/cv2 fallback in io/dicom.py.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdicomlite.so"))
_lib = None
_lib_failed = False


class _DicomInfo(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_int32), ("cols", ctypes.c_int32),
        ("frames", ctypes.c_int32), ("samples", ctypes.c_int32),
        ("bits", ctypes.c_int32), ("planar", ctypes.c_int32),
        ("pixel_spacing", ctypes.c_double), ("frame_rate", ctypes.c_double),
        ("heart_rate", ctypes.c_double),
        ("patient_id", ctypes.c_char * 64),
        ("photometric", ctypes.c_char * 20),
        ("transfer_syntax", ctypes.c_char * 64),
        ("n_rwaves", ctypes.c_int32),
        ("rwave_times", ctypes.c_double * 256),
        ("pixel_data_offset", ctypes.c_int64),
        ("pixel_data_size", ctypes.c_int64),
        ("encapsulated", ctypes.c_int32),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        src = os.path.abspath(os.path.join(_NATIVE_DIR, "dicomlite.cpp"))
        stale = (not os.path.exists(_LIB_PATH) or
                 (os.path.exists(src) and
                  os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
        if stale:
            # also covers a previously-built .so that predates newly
            # added symbols (e.g. dicom_jpegll_decode after a pull):
            # make compares the same mtimes and rebuilds
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        if not hasattr(lib, "dicom_jpegll_decode"):
            # stale binary without the newest symbols (mtimes can lie —
            # preserved-mtime copies, branch switches): force a rebuild,
            # then load it via a unique temp copy. Re-dlopen of the SAME
            # path can return the stale in-process mapping (glibc caches
            # by pathname and dev/inode), so a fresh pathname is the
            # only reliable way to resolve the new symbols.
            import shutil
            import tempfile

            subprocess.run(["make", "-B", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
            fd, tmp_path = tempfile.mkstemp(suffix=".so",
                                            prefix="dicomlite_")
            os.close(fd)
            try:
                shutil.copy2(_LIB_PATH, tmp_path)
                fresh = ctypes.CDLL(tmp_path)
                if hasattr(fresh, "dicom_jpegll_decode"):
                    lib = fresh
            finally:
                # the mapping keeps the inode alive; the name can go
                try:
                    os.unlink(tmp_path)
                except OSError:
                    pass
        lib.dicom_parse.argtypes = [ctypes.c_char_p, ctypes.POINTER(_DicomInfo)]
        lib.dicom_parse.restype = ctypes.c_int
        lib.dicom_read_pixels.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.dicom_read_pixels.restype = ctypes.c_int64
        lib.dicom_rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.dicom_rle_decode.restype = ctypes.c_int64
        if hasattr(lib, "dicom_jpegll_decode"):
            lib.dicom_jpegll_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32)]
            lib.dicom_jpegll_decode.restype = ctypes.c_int64
        else:
            # a missing optional symbol must not poison the whole native
            # path: RLE/uncompressed decode keep working, JPEG-Lossless
            # reads fall through to the loud DICOMReadError in io/dicom
            logger.warning(
                "libdicomlite.so lacks dicom_jpegll_decode even after "
                "rebuild; JPEG-Lossless decode disabled, other native "
                "paths kept")
        _lib = lib
    except Exception as exc:
        logger.info("native dicomlite unavailable (%s); using pure-Python parser", exc)
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


_RLE_UID = "1.2.840.10008.1.2.5"
_JPEGLL_UID = "1.2.840.10008.1.2.4.70"


def jpegll_decode_frame(payload: bytes) -> Optional[np.ndarray]:
    """Decode one JPEG-Lossless (process 14) frame payload via the C++
    decoder (native/dicomlite.cpp dicom_jpegll_decode). Returns
    (H, W) or (H, W, S) uint8/uint16, or None if the native library is
    unavailable or the stream is not a decodable lossless JPEG."""
    lib = _load()
    if lib is None or not hasattr(lib, "dicom_jpegll_decode"):
        return None
    # capacity guess from the SOF3 header is overkill; retry-on-capacity
    # keeps the ABI simple (one frame is at most a few MB)
    cap = max(len(payload) * 4, 1 << 20)
    for _ in range(4):
        out = np.empty(cap, np.uint16)
        info = (ctypes.c_int32 * 4)()
        got = lib.dicom_jpegll_decode(
            payload, len(payload),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out.size,
            info)
        if got == -4:  # DICOM_E_CAPACITY
            cap *= 8
            continue
        if got <= 0:
            return None
        rows, cols, ncomp, precision = (int(info[i]) for i in range(4))
        arr = out[:got].reshape(rows, cols, ncomp)
        if ncomp == 1:
            arr = arr[..., 0]
        return arr.astype(np.uint8) if precision <= 8 else arr.copy()
    return None


def _encapsulated_payloads(path: str, info: "_DicomInfo"):
    """Yield the frame payloads of an encapsulated pixel-data stream
    (Python walks a few 8-byte item headers; decode stays in C++).
    Yields None once on malformed streams."""
    import struct

    with open(path, "rb") as f:
        f.seek(int(info.pixel_data_offset))
        data = f.read(int(info.pixel_data_size))
    pos = 0
    first = True
    while pos + 8 <= len(data):
        group, elem, ilen = struct.unpack_from("<HHI", data, pos)
        pos += 8
        if (group, elem) == (0xFFFE, 0xE0DD):
            break
        if (group, elem) != (0xFFFE, 0xE000):
            yield None
            return
        payload = data[pos:pos + ilen]
        pos += ilen
        if first:
            first = False
            continue  # basic offset table (possibly empty)
        yield payload


def _decode_rle_stream(path: str, info: "_DicomInfo", lib) -> Optional[np.ndarray]:
    rows, cols = int(info.rows), int(info.cols)
    samples = max(int(info.samples), 1)
    frame_bytes = rows * cols * samples
    frames = []
    segcounts = (ctypes.c_int32 * 16)()
    for payload in _encapsulated_payloads(path, info):
        if payload is None:
            return None
        out = np.empty(frame_bytes, np.uint8)
        got = lib.dicom_rle_decode(
            payload, len(payload),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
            segcounts)
        if got != frame_bytes:
            return None
        if samples > 1:
            frames.append(out.reshape(samples, rows, cols).transpose(1, 2, 0))
        else:
            frames.append(out.reshape(rows, cols))
    if not frames:
        return None
    return np.stack(frames)


def _decode_jpegll_stream(path: str, info: "_DicomInfo") -> Optional[np.ndarray]:
    from .dicom import group_jpeg_fragments

    rows, cols = int(info.rows), int(info.cols)
    samples = max(int(info.samples), 1)
    payloads = []
    for payload in _encapsulated_payloads(path, info):
        if payload is None:
            return None
        payloads.append(bytes(payload))
    frames = []
    for payload in group_jpeg_fragments(payloads, max(int(info.frames), 1)):
        arr = jpegll_decode_frame(payload)
        if arr is None:
            return None
        shape = (rows, cols) if samples == 1 else (rows, cols, samples)
        if arr.shape != shape:
            return None
        frames.append(arr)
    if not frames:
        return None
    return np.stack(frames)


def native_read(path: str) -> Optional[Tuple[dict, np.ndarray]]:
    """Parse + decode with the native library. Returns None on any
    condition the Python fallback should handle instead."""
    lib = _load()
    if lib is None:
        return None
    info = _DicomInfo()
    rc = lib.dicom_parse(path.encode(), ctypes.byref(info))
    if rc != 0 or info.pixel_data_size <= 0:
        return None
    if info.bits not in (8, 16) or info.rows <= 0 or info.cols <= 0:
        return None
    if info.encapsulated:
        # RLE rides the native packbits decoder and JPEG-Lossless the
        # native process-14 decoder; other encapsulated syntaxes
        # (baseline/extended JPEG) stay on the cv2 fallback
        ts = info.transfer_syntax.decode(errors="replace").strip("\x00 ")
        if ts == _RLE_UID and info.bits == 8:
            arr = _decode_rle_stream(path, info, lib)
        elif ts == _JPEGLL_UID:
            arr = _decode_jpegll_stream(path, info)
        else:
            return None
        if arr is None:
            return None
        return _build_meta(info), np.ascontiguousarray(arr)

    buf = np.empty(int(info.pixel_data_size), np.uint8)
    got = lib.dicom_read_pixels(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size)
    if got <= 0:
        return None

    dtype = np.uint16 if info.bits == 16 else np.uint8
    arr = buf.view(dtype)
    frames = max(int(info.frames), 1)
    expected = frames * info.rows * info.cols * info.samples
    if arr.size < expected:
        return None
    arr = arr[:expected]
    if info.samples > 1:
        if info.planar == 1:
            arr = arr.reshape(frames, info.samples, info.rows, info.cols)
            arr = arr.transpose(0, 2, 3, 1)
        else:
            arr = arr.reshape(frames, info.rows, info.cols, info.samples)
    else:
        arr = arr.reshape(frames, info.rows, info.cols)

    return _build_meta(info), np.ascontiguousarray(arr)


def _build_meta(info: "_DicomInfo") -> dict:
    return {
        "pixel_spacing": info.pixel_spacing if info.pixel_spacing >= 0 else None,
        "frame_rate": info.frame_rate if info.frame_rate >= 0 else None,
        "R_times": (np.asarray(info.rwave_times[:info.n_rwaves])
                    if info.n_rwaves > 0 else None),
        "R_wave_data_present": info.n_rwaves > 0,
        "patient_id": info.patient_id.decode(errors="replace"),
        "heart_rate": info.heart_rate if info.heart_rate >= 0 else None,
        "photometric": info.photometric.decode(errors="replace"),
        "transfer_syntax": info.transfer_syntax.decode(errors="replace"),
    }

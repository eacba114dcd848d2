"""ctypes bindings for the native libavcodec decode stage (native/decode).

The C++ half of the video->frames boundary the reference crossed with an
ffmpeg subprocess (/root/reference/dataset/extract_frames.py:120-122):
in-process demux + decode + swscale resize, frames sampled at a fixed
rate, handed over as RGB numpy arrays with zero JPEG round trips.
Auto-builds libvdecode.so on first use; the cv2 path in data/video.py is
the fallback/oracle (repo-standard native pattern)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Iterator, Optional, Tuple

import numpy as np

_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "decode")
)
_LIB = os.path.join(_DIR, "libvdecode.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # First-use build + load under an exclusive file lock: N decode
        # worker processes forked simultaneously must not race `make` (a
        # worker dlopening a partially linked .so would silently fall back
        # to PIL, making pixel content backend-dependent per worker).
        import fcntl

        with open(os.path.join(_DIR, ".build.lock"), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                if not os.path.exists(_LIB):
                    subprocess.run(["make", "-s"], cwd=_DIR, check=True,
                                   capture_output=True)
                lib = ctypes.CDLL(_LIB)
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)
        lib.decoder_open.argtypes = [
            ctypes.c_char_p, ctypes.c_double, ctypes.c_int, ctypes.c_int
        ]
        lib.decoder_open.restype = ctypes.c_void_p
        lib.decoder_info.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
        ]
        lib.decoder_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)
        ]
        lib.decoder_next.restype = ctypes.c_int
        lib.decoder_close.argtypes = [ctypes.c_void_p]
        lib.jpeg_batch_decode.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.jpeg_batch_decode.restype = ctypes.c_int
        lib.encoder_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_char_p,
        ]
        lib.encoder_open.restype = ctypes.c_void_p
        lib.encoder_write.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)
        ]
        lib.encoder_write.restype = ctypes.c_int
        lib.encoder_close.argtypes = [ctypes.c_void_p]
        lib.encoder_close.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def jpeg_batch(
    paths,
    size: int,
    n_threads: Optional[int] = None,
) -> Tuple[np.ndarray, list]:
    """Decode a batch of JPEG files to (N, size, size, 3) uint8 in ONE C
    call (threaded; n_threads=0 uses all hardware threads; the default
    reads VDQN_JPEG_THREADS — decode worker PROCESSES set it to
    cores/num_workers so process- and thread-level parallelism compose
    instead of multiplying, see data/workers.py). Each image is
    DCT-scale decoded + smallest-edge bilinear resized + center cropped —
    the same transform as qlearning._load_image (the PIL twin/oracle),
    replacing the reference's per-image Python loader
    (/root/reference/dataloaders/q_learning_real.py:19-24) with a batch
    native stage. Returns (array, failed_indices); failed slots are
    undefined and the caller must fall back (see QLearningBatcher)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libvdecode unavailable")
    if n_threads is None:
        n_threads = int(os.environ.get("VDQN_JPEG_THREADS", "0"))
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    failed = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.jpeg_batch_decode(
        arr, n, int(size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(n_threads),
    )
    return out, np.flatnonzero(failed).tolist()


def encode_video(path: str, frames, fps: float = 10.0,
                 codec: str = "") -> int:
    """Encode an iterable of RGB uint8 (H, W, 3) frames into a real video
    file (container chosen by extension; `.mp4` + libx264 is the default
    pairing — the same bytes family as the reference's YouTube corpus,
    /root/reference/dataset/download_videos.py). Returns the frame count.

    This is the encode twin of :func:`decode_frames`; the video-bytes
    lifecycle driver (scripts/lifecycle_video_bytes.py) uses it to turn
    rendered sim walks into genuine mp4s for dataset/extract_frames.py.
    Dimensions must be even (yuv420p chroma subsampling)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libvdecode unavailable")
    h = None
    n = 0
    try:
        for frame in frames:
            frame = np.ascontiguousarray(frame, np.uint8)
            if frame.ndim != 3 or frame.shape[2] != 3:
                raise ValueError(f"expected (H, W, 3) RGB, got {frame.shape}")
            if h is None:
                hh, ww = frame.shape[:2]
                h = lib.encoder_open(path.encode(), int(ww), int(hh),
                                     float(fps), codec.encode())
                if not h:
                    raise IOError(
                        f"cannot open encoder for {path} "
                        f"({ww}x{hh} @ {fps} fps; even dims required)")
                shape = frame.shape
            elif frame.shape != shape:
                raise ValueError(
                    f"frame {n} shape {frame.shape} != first frame {shape}")
            if lib.encoder_write(
                    h, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))) < 0:
                raise IOError(f"encode error at frame {n} in {path}")
            n += 1
        if h is None:
            raise ValueError("no frames to encode")
    finally:
        if h is not None:
            rc = lib.encoder_close(h)
            h = None
            # don't mask an in-flight exception with the finalize error
            if rc < 0 and sys.exc_info()[0] is None:
                raise IOError(f"finalize error for {path}")
    return n


def decode_frames(
    path: str,
    fps: float = 0.5,
    target: Optional[Tuple[int, int]] = None,
) -> Iterator[np.ndarray]:
    """Yield RGB uint8 (H, W, 3) frames sampled at `fps` (0 = every frame).
    `target`: optional (width, height) swscale resize fused into decode."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libvdecode unavailable")
    tw, th = target if target is not None else (0, 0)
    h = lib.decoder_open(path.encode(), float(fps), int(tw), int(th))
    if not h:
        raise IOError(f"cannot open {path}")
    try:
        w = ctypes.c_int()
        hh = ctypes.c_int()
        dur = ctypes.c_double()
        lib.decoder_info(h, ctypes.byref(w), ctypes.byref(hh), ctypes.byref(dur))
        buf = np.empty((hh.value, w.value, 3), np.uint8)
        while True:
            r = lib.decoder_next(h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if r == 0:
                return
            if r < 0:
                raise IOError(f"decode error {r} in {path}")
            yield buf.copy()
    finally:
        lib.decoder_close(h)

"""ctypes bindings + lazy build of the native batch packer.

``pack_batch_native(examples, spec)`` is a drop-in for
``cmhse_tpu.data.bucketing.pad_batch``; ``available()`` reports whether the
shared library could be built/loaded (falls back to the numpy path
otherwise). The loader (`data/loader.py`) picks the native path
automatically when present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "packer.cpp")
_LIB = os.path.join(_HERE, "libpacker.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    lib.pack_frames.restype = None
    lib.pack_frames.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),  # clip_ptrs
        ctypes.POINTER(ctypes.c_int64),  # nframes
        ctypes.POINTER(ctypes.c_int64),  # clip_off
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.pack_frames_bf16.restype = None
    lib.pack_frames_bf16.argtypes = lib.pack_frames.argtypes
    lib.pack_tokens.restype = None
    lib.pack_tokens.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def pack_batch_native(examples: list, spec):
    """Native equivalent of :func:`cmhse_tpu.data.bucketing.pad_batch`."""
    from cmhse_tpu.data.batch import Batch

    lib = _load()
    if lib is None:
        raise RuntimeError("native packer unavailable")
    b = spec.batch_size
    if len(examples) > b:
        raise ValueError(f"batch of {len(examples)} > spec batch_size {b}")

    # CSR over clips/sentences; keep references so buffers stay alive
    clip_arrays, sent_arrays = [], []
    clip_off = np.zeros(b + 1, np.int64)
    sent_off = np.zeros(b + 1, np.int64)
    for i, ex in enumerate(examples):
        clip_arrays.extend(
            np.ascontiguousarray(c, dtype=np.float32) for c in ex.clips
        )
        sent_arrays.extend(
            np.ascontiguousarray(s, dtype=np.int32) for s in ex.sentences
        )
        clip_off[i + 1] = len(clip_arrays)
        sent_off[i + 1] = len(sent_arrays)
    clip_off[len(examples) + 1 :] = clip_off[len(examples)]
    sent_off[len(examples) + 1 :] = sent_off[len(examples)]

    for c in clip_arrays:
        if c.ndim != 2 or c.shape[1] != spec.feat_dim:
            raise ValueError(f"clip shape {c.shape} != (*, {spec.feat_dim})")

    nframes = np.asarray([c.shape[0] for c in clip_arrays], np.int64)
    nwords = np.asarray([s.shape[0] for s in sent_arrays], np.int64)
    clip_ptrs = (ctypes.c_void_p * max(len(clip_arrays), 1))(
        *[c.ctypes.data for c in clip_arrays]
    )
    sent_ptrs = (ctypes.c_void_p * max(len(sent_arrays), 1))(
        *[s.ctypes.data for s in sent_arrays]
    )

    # allocate straight in the target dtype for the two dtypes the native
    # packer writes (f32 passthrough, bf16 RNE-converted in the copy loop —
    # parity-tested vs numpy astype); any OTHER dtype packs f32 and casts
    # after (itemsize alone must NOT pick the bf16 writer: f16 shares
    # itemsize 2 but not bit layout — review catch)
    import ml_dtypes

    dt = spec.np_feature_dtype()
    native_dt = dt if dt in (np.dtype(np.float32),
                             np.dtype(ml_dtypes.bfloat16)) else \
        np.dtype(np.float32)
    frames = np.empty((b, spec.max_clips, spec.max_frames, spec.feat_dim),
                      native_dt)
    frame_len = np.empty((b, spec.max_clips), np.int32)
    clip_len = np.empty((b,), np.int32)
    words = np.empty((b, spec.max_sentences, spec.max_words), np.int32)
    word_len = np.empty((b, spec.max_sentences), np.int32)
    sent_len = np.empty((b,), np.int32)

    i64p = ctypes.POINTER(ctypes.c_int64)
    pack_fr = (lib.pack_frames_bf16
               if native_dt == np.dtype(ml_dtypes.bfloat16)
               else lib.pack_frames)
    pack_fr(
        clip_ptrs, nframes.ctypes.data_as(i64p), clip_off.ctypes.data_as(i64p),
        b, spec.max_clips, spec.max_frames, spec.feat_dim,
        frames.ctypes.data, frame_len.ctypes.data, clip_len.ctypes.data,
    )
    lib.pack_tokens(
        sent_ptrs, nwords.ctypes.data_as(i64p), sent_off.ctypes.data_as(i64p),
        b, spec.max_sentences, spec.max_words,
        words.ctypes.data, word_len.ctypes.data, sent_len.ctypes.data,
    )

    video_ids = np.full((b,), -1, np.int32)
    valid = np.zeros((b,), bool)
    for i, ex in enumerate(examples):
        video_ids[i] = ex.video_id
        valid[i] = True

    if frames.dtype != dt:
        frames = frames.astype(dt)  # non-f32/bf16 dtypes: cast after packing
    return Batch(
        frames=frames, frame_len=frame_len, clip_len=clip_len,
        words=words, word_len=word_len, sent_len=sent_len,
        video_ids=video_ids, valid=valid,
    )

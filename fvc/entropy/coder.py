"""Host-side entropy coding: ctypes bindings to the native rANS coder plus CDF
table quantization and the batched `entropy_trick` helpers.

Design (SURVEY §7 hard-parts): the device (XLA) produces integer symbols and
CDF indexes; one async D2H transfer feeds a single batched rANS call — the
TPU-native analogue of the reference's entropy_trick (entropy_models.py:278-290),
which folds the whole batch into one coder invocation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB = None

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "rans.cc")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "librans.so")


def _build_library() -> str:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src])
    return so


def _lib():
    global _LIB
    with _LIB_LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_library())
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            lib.rans_encode_with_indexes.restype = ctypes.c_int
            lib.rans_encode_with_indexes.argtypes = [
                i32p, i32p, ctypes.c_int, i32p, ctypes.c_int, i32p, i32p,
                u8p, ctypes.c_int]
            lib.rans_decode_with_indexes.restype = ctypes.c_int
            lib.rans_decode_with_indexes.argtypes = [
                u8p, ctypes.c_int, i32p, ctypes.c_int, i32p, ctypes.c_int,
                i32p, i32p, i32p]
            _LIB = lib
    return _LIB


def pmf_to_quantized_cdf(pmf: np.ndarray, tail_mass: float, precision: int = 16) -> np.ndarray:
    """Quantize a pmf (+ tail escape slot) to a 2^precision integer CDF.
    Every symbol gets freq >= 1; the largest entry absorbs rounding error.
    Returns cdf of length len(pmf) + 2 with cdf[0]=0, cdf[-1]=2^precision."""
    p = np.clip(np.asarray(pmf, np.float64), 0.0, None)
    p = np.concatenate([p, [max(tail_mass, 1e-12)]])
    total = p.sum()
    if not np.isfinite(total) or total <= 0:
        p = np.ones_like(p)
        total = p.sum()
    freqs = np.round(p / total * (1 << precision)).astype(np.int64)
    freqs = np.maximum(freqs, 1)
    # fix the sum by adjusting the largest freq (guaranteed to stay >= 1
    # because excess < number of symbols << max freq in practice; clamp anyway)
    excess = int(freqs.sum()) - (1 << precision)
    while excess != 0:
        j = int(np.argmax(freqs))
        adj = min(excess, int(freqs[j]) - 1) if excess > 0 else excess
        if excess > 0 and adj == 0:
            raise ValueError("cannot normalize cdf: too many symbols for precision")
        freqs[j] -= adj
        excess -= adj
    cdf = np.zeros(len(p) + 1, dtype=np.int32)
    cdf[1:] = np.cumsum(freqs)
    return cdf


class RansCoder:
    """Batched encode/decode against a fixed CDF table set.

    cdf:        [num_cdfs, Lmax+2] int32 quantized CDFs (ragged via cdf_length)
    cdf_length: [num_cdfs] int32
    offset:     [num_cdfs] int32  (symbol -> table-space shift)
    """

    def __init__(self, cdf: np.ndarray, cdf_length: np.ndarray, offset: np.ndarray):
        self.cdf = np.ascontiguousarray(cdf, np.int32)
        self.cdf_length = np.ascontiguousarray(cdf_length, np.int32)
        self.offset = np.ascontiguousarray(offset, np.int32)

    def encode_with_indexes(self, symbols: np.ndarray, indexes: np.ndarray) -> bytes:
        symbols = np.ascontiguousarray(symbols.reshape(-1), np.int32)
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        assert symbols.shape == indexes.shape
        cap = max(1024, symbols.size * 8 + 1024)
        out = np.empty(cap, np.uint8)
        n = _lib().rans_encode_with_indexes(
            symbols, indexes, symbols.size, self.cdf, self.cdf.shape[1],
            self.cdf_length, self.offset, out, cap)
        if n < 0:
            raise RuntimeError("rans encode overflow")
        return out[:n].tobytes()

    def decode_with_indexes(self, data: bytes, indexes: np.ndarray) -> np.ndarray:
        shape = indexes.shape
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        buf = np.frombuffer(data, np.uint8).copy()
        out = np.empty(indexes.size, np.int32)
        _lib().rans_decode_with_indexes(
            buf, buf.size, indexes, indexes.size, self.cdf, self.cdf.shape[1],
            self.cdf_length, self.offset, out)
        return out.reshape(shape)


# ------------------------------------------------------------------
# entropy_trick-style convenience wrappers
# ------------------------------------------------------------------

def encode_factorized(latent: np.ndarray, medians: np.ndarray, coder: RansCoder) -> bytes:
    """Code a [..., C] integer-offset latent with per-channel factorized CDFs in
    ONE rANS call (batch folded like entropy_models.py:278-290)."""
    C = latent.shape[-1]
    symbols = np.round(latent - medians).astype(np.int32)
    idx = np.broadcast_to(np.arange(C, dtype=np.int32), latent.shape)
    return coder.encode_with_indexes(symbols, idx)


def decode_factorized(data: bytes, shape, medians: np.ndarray, coder: RansCoder) -> np.ndarray:
    C = shape[-1]
    idx = np.broadcast_to(np.arange(C, dtype=np.int32), shape)
    symbols = coder.decode_with_indexes(data, np.ascontiguousarray(idx))
    return symbols.astype(np.float32) + medians


def encode_gaussian(latent: np.ndarray, indexes: np.ndarray, means: np.ndarray,
                    coder: RansCoder) -> bytes:
    symbols = np.round(latent - means).astype(np.int32)
    return coder.encode_with_indexes(symbols, indexes)


def decode_gaussian(data: bytes, indexes: np.ndarray, means: np.ndarray,
                    coder: RansCoder) -> np.ndarray:
    symbols = coder.decode_with_indexes(data, indexes)
    return symbols.astype(np.float32) + means

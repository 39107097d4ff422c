"""Precision policy — bf16 matrix units with f32 accumulation.

The TPU analogue of the reference's AMP GradScaler loops (train.py:177,204-207):
on TPU, bf16 needs no loss scaling (SURVEY §2.5 "Mixed precision"). The policy
is a context: inside `bf16_compute()`, every conv in fvc.ops.conv casts its
operands to bf16 and accumulates in f32 (preferred_element_type) — the MXU
fast path — while all elementwise/entropy math stays f32.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax.numpy as jnp

_COMPUTE_DTYPE: contextvars.ContextVar = contextvars.ContextVar(
    "fvc_compute_dtype", default=None)


def compute_dtype():
    return _COMPUTE_DTYPE.get()


@contextlib.contextmanager
def bf16_compute():
    token = _COMPUTE_DTYPE.set(jnp.bfloat16)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.reset(token)


@contextlib.contextmanager
def compute_in(dtype: Optional[jnp.dtype]):
    token = _COMPUTE_DTYPE.set(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.reset(token)


_PALLAS_GDN: contextvars.ContextVar = contextvars.ContextVar(
    "fvc_pallas_gdn", default=False)


def pallas_gdn_enabled() -> bool:
    return _PALLAS_GDN.get()


@contextlib.contextmanager
def pallas_gdn():
    """Route GDN/IGDN through the fused Pallas kernel (TPU only)."""
    token = _PALLAS_GDN.set(True)
    try:
        yield
    finally:
        _PALLAS_GDN.reset(token)


_PALLAS_SPYNET: contextvars.ContextVar = contextvars.ContextVar(
    "fvc_pallas_spynet", default=False)


def pallas_spynet_enabled() -> bool:
    import os

    return _PALLAS_SPYNET.get() or os.environ.get("FVC_PALLAS_SPYNET") == "1"


@contextlib.contextmanager
def pallas_spynet():
    """Route every SpyNet MEBasic level through the fused VMEM-resident
    Pallas kernel (fvc.ops.pallas_spynet.fused_mebasic_tiles) — exact vs
    the XLA path incl. borders; inference fast path, TPU only."""
    token = _PALLAS_SPYNET.set(True)
    try:
        yield
    finally:
        _PALLAS_SPYNET.reset(token)


_PALLAS_WARPNET: contextvars.ContextVar = contextvars.ContextVar(
    "fvc_pallas_warpnet", default=False)


def pallas_warpnet_enabled() -> bool:
    import os

    return (_PALLAS_WARPNET.get()
            or os.environ.get("FVC_PALLAS_WARPNET") == "1")


@contextlib.contextmanager
def pallas_warpnet():
    """Route WarpNet ResBlocks through the fused two-conv Pallas kernel
    (fvc.ops.pallas_warpnet.fused_resblock) — exact vs the XLA path incl.
    borders; inference fast path for the E-MC stage (the round-4 #1 cost
    at 8.7% SoL, docs/PERF_r04.log)."""
    token = _PALLAS_WARPNET.set(True)
    try:
        yield
    finally:
        _PALLAS_WARPNET.reset(token)


_SSF_PYRAMID: contextvars.ContextVar = contextvars.ContextVar(
    "fvc_ssf_pyramid", default=False)


def ssf_pyramid_enabled() -> bool:
    return _SSF_PYRAMID.get()


@contextlib.contextmanager
def ssf_pyramid():
    """Route SSF forward_prediction through the fused native-resolution
    pyramid (fvc.models.ssf._forward_prediction_pyramid): coarse Gaussian
    levels are warped at their decimated resolution and upsampled, instead
    of materializing the full-resolution [B,D,H,W,C] scale-space volume —
    the HBM whale of the SSF/ELFVC/MCVC families (XLA cost analysis at
    2048x1024: 12.7 -> 5.9 GB accessed, 6.6 -> 3.2 GFLOP per call;
    > 50 dB agreement with the volume path)."""
    token = _SSF_PYRAMID.set(True)
    try:
        yield
    finally:
        _SSF_PYRAMID.reset(token)

"""GOP orchestration — the runtime layer (reference parallel_compression,
models.py:233-410), rebuilt as XLA-friendly scans.

`code_gop_scan` runs a sequential P-frame codec over a GOP with `lax.scan`:
one traced step, static GOP length, recurrent state threaded through the carry,
reference detach semantics (recon + state stop-gradients between frames).

The GOP axis is the natural multi-host data-parallel axis (SURVEY §2.5): each
device/host codes its own GOPs; gradients all-reduce in the train step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def code_gop_scan(apply_fn: Callable, params, frames, init_state, *,
                  training: bool, rng=None, detach_between_frames: bool = True):
    """Sequentially code frames[1:] against running reconstructions.

    apply_fn(params, x_ref, x_cur, state, rpm_flag, training, rng)
        -> (recon, new_state, out_dict)   (the IterPredCodec signature)
    frames: [T, B, H, W, 3]; frames[0] is the (already coded) I-frame.

    Returns (recons [T-1,...], outs stacked over frames).
    """
    T = frames.shape[0]
    x0 = frames[0]

    if rng is None:
        rngs = jnp.zeros((T - 1, 2), dtype=jnp.uint32)
        use_rng = False
    else:
        rngs = jax.random.split(rng, T - 1)
        use_rng = True

    def step(carry, inp):
        x_ref, state = carry
        idx, x_cur, step_rng = inp
        rpm_flag = idx > 0  # first P-frame uses the non-recurrent entropy path
        recon, new_state, out = apply_fn(
            params, x_ref, x_cur, state, rpm_flag,
            training=training, rng=step_rng if use_rng else None)
        carry_recon = jax.lax.stop_gradient(recon) if detach_between_frames else recon
        return (carry_recon, new_state), (recon, out)

    idxs = jnp.arange(T - 1)
    (_, _), (recons, outs) = jax.lax.scan(
        step, (x0, init_state), (idxs, frames[1:], rngs))
    return recons, outs


def code_gop_bidirectional(apply_fn, params, frames, init_state, *,
                           training: bool, rng=None, mid=None):
    """RLVC's bidirectional GOP-13 window (train.py:266,321,346-357 /
    SURVEY §5: fP=6,bP=6): the I-frame sits mid-GOP; the forward half scans
    ahead and the backward half scans the time-reversed prefix, each with its
    own recurrent state chain.

    frames: [T, B, H, W, 3]; the I-frame is frames[mid] (default T//2, i.e.
    bP = T//2 backward P-frames and fP = T-1-T//2 forward ones).
    Returns (recons [T-1, ...] in display order, outs dict with both halves'
    scalars concatenated in display order)."""
    T = frames.shape[0]
    if mid is None:
        mid = T // 2
    fwd = frames[mid:]                      # [I, P, P, ...]
    bwd = frames[mid::-1]                   # [I, P, P, ...] reversed prefix
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    rec_f, out_f = code_gop_scan(apply_fn, params, fwd, init_state,
                                 training=training, rng=r1)
    rec_b, out_b = code_gop_scan(apply_fn, params, bwd, init_state,
                                 training=training, rng=r2)
    # display order: reversed backward half, then forward half
    recons = jnp.concatenate([rec_b[::-1], rec_f], axis=0)
    outs = {k: jnp.concatenate([out_b[k][::-1], out_f[k]], axis=0)
            for k in out_f}
    return recons, outs


def gop_metrics(outs) -> dict:
    """Average per-frame scalars from a scanned GOP (bpp/psnr/losses)."""
    return {k: jnp.mean(v) for k, v in outs.items()
            if isinstance(v, jnp.ndarray) and v.ndim == 1}

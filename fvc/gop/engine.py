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


def gop_metrics(outs) -> dict:
    """Average per-frame scalars from a scanned GOP (bpp/psnr/losses)."""
    return {k: jnp.mean(v) for k, v in outs.items()
            if isinstance(v, jnp.ndarray) and v.ndim == 1}

"""Evaluation harness — eval.py's static_simulation_model equivalent.

Per-GOP coding with GOP=16 (fP=15 + I-frame), per-video logs in the reference's
2-line append-only format (summary + per-frame PSNR list, eval.py:332-337),
and an RD-sweep across compression levels (train.py --evaluate).

Also BD-rate/BD-PSNR (piecewise-cubic integration, plot_mcvc.py:299-390
behavior) for comparing RD curves against anchors.
"""

from __future__ import annotations

import time
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def eval_lsvc_on_gops(model, variables, gops, *, i_codec=None, i_vars=None):
    """Code each [T,H,W,3] GOP (frame 0 = I-frame) and collect metrics.
    If a learned I-codec is given, frame 0 is replaced by its reconstruction
    and its bpp accounted (parallel_compression models.py:249-256)."""
    results = []

    from fvc.ops.ms_ssim import ms_ssim_db

    @jax.jit
    def run(variables, x):
        com, out = model.apply(variables, x, training=False)
        msssim = jnp.mean(ms_ssim_db(x[1:], com))
        return out["bpp_est"], out["psnr"], out["psnr_list"], msssim

    i_run = None
    if i_codec is not None:
        @jax.jit
        def i_run(v, x):
            x_hat, out = i_codec.apply(v, x, training=False)
            return x_hat, out["bpp_est"], out["psnr"]

    for gop in gops:
        x = jnp.asarray(gop)
        i_bpp = i_psnr = None
        if i_run is not None:
            x0_hat, i_bpp, i_psnr = i_run(i_vars, x[:1])
            x = x.at[0].set(x0_hat[0])
        t0 = time.perf_counter()
        bpp, psnr, psnr_list, msssim = run(variables, x)
        jax.block_until_ready(psnr)
        dt = time.perf_counter() - t0
        results.append({
            "bpp": float(bpp), "psnr": float(psnr),
            "msssim_db": float(msssim),
            "psnr_list": np.asarray(psnr_list).tolist(),
            "time_per_frame": dt / (x.shape[0] - 1),
            "i_bpp": None if i_bpp is None else float(i_bpp),
            "i_psnr": None if i_psnr is None else float(i_psnr),
        })
    return results


def write_eval_log(path: str, codec: str, dataset: str, results: List[dict]):
    """Append-only 2-line-per-video record mirroring eval.py:332-337."""
    with open(path, "a") as f:
        bpps = [r["bpp"] for r in results]
        psnrs = [r["psnr"] for r in results]
        ts = [r["time_per_frame"] for r in results]
        f.write(f"{codec} {dataset} {np.mean(bpps):.6f} {np.mean(psnrs):.4f} "
                f"{np.mean(ts):.6f}\n")
        for r in results:
            f.write(" ".join(f"{p:.3f}" for p in r["psnr_list"]) + "\n")


def rd_sweep(make_model: Callable[[int], tuple], gops, levels: Sequence[int]):
    """RD curve over compression levels (train.py --evaluate 8-level sweep)."""
    curve = []
    for lvl in levels:
        model, variables = make_model(lvl)
        res = eval_lsvc_on_gops(model, variables, gops)
        curve.append({"level": lvl,
                      "bpp": float(np.mean([r["bpp"] for r in res])),
                      "psnr": float(np.mean([r["psnr"] for r in res]))})
    return curve


# ---------------------------------------------------------------------------
# BD-rate / BD-PSNR (Bjøntegaard deltas)
# ---------------------------------------------------------------------------

def _pchip_integrate(x, y, lo, hi):
    from scipy.interpolate import PchipInterpolator

    order = np.argsort(x)
    f = PchipInterpolator(np.asarray(x)[order], np.asarray(y)[order])
    return f.integrate(lo, hi)


def bd_rate(r1, p1, r2, p2) -> float:
    """BD-rate (%) of curve 2 vs curve 1 (negative = curve 2 cheaper at equal
    quality). Piecewise-cubic log-rate integration (plot_mcvc.py:299-390)."""
    lr1, lr2 = np.log(np.asarray(r1)), np.log(np.asarray(r2))
    lo = max(min(p1), min(p2))
    hi = min(max(p1), max(p2))
    if hi <= lo:
        return float("nan")
    i1 = _pchip_integrate(p1, lr1, lo, hi)
    i2 = _pchip_integrate(p2, lr2, lo, hi)
    return float((np.exp((i2 - i1) / (hi - lo)) - 1.0) * 100.0)


def bd_psnr(r1, p1, r2, p2) -> float:
    """BD-PSNR (dB) of curve 2 vs curve 1 over the overlapping log-rate span."""
    lr1, lr2 = np.log(np.asarray(r1)), np.log(np.asarray(r2))
    lo = max(min(lr1), min(lr2))
    hi = min(max(lr1), max(lr2))
    if hi <= lo:
        return float("nan")
    i1 = _pchip_integrate(lr1, p1, lo, hi)
    i2 = _pchip_integrate(lr2, p2, lo, hi)
    return float((i2 - i1) / (hi - lo))

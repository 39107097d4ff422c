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

    from fvc.ops.ms_ssim import ms_ssim_db_np

    @jax.jit
    def run(variables, x):
        com, out = model.apply(variables, x, training=False)
        # motion/residual bit split (plot_hermes.py:708-719 analysis);
        # recon returned for the host-f64 MS-SSIM (the on-device f32 metric
        # saturates into noise above ~70 dB — see fvc.ops.ms_ssim)
        return (out["bpp_est"], out["psnr"], out["psnr_list"], com,
                out.get("bpp_mv", jnp.float32(0)),
                out.get("bpp_res", jnp.float32(0)))

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
        bpp, psnr, psnr_list, com, bpp_mv, bpp_res = run(variables, x)
        jax.block_until_ready(psnr)
        dt = time.perf_counter() - t0
        msssim = float(np.mean(ms_ssim_db_np(np.asarray(x[1:]),
                                             np.asarray(com))))
        results.append({
            "bpp": float(bpp), "psnr": float(psnr),
            "msssim_db": msssim,
            "psnr_list": np.asarray(psnr_list).tolist(),
            "bpp_mv": float(bpp_mv), "bpp_res": float(bpp_res),
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


def init_family_variables(codec_name: str, model, gop0, *, num_views: int = 1,
                          seed: int = 0):
    """Shape-correct variable init per codec family (each family has its own
    forward signature — the reference's design wart, SURVEY §1 L4->L3)."""
    key = jax.random.PRNGKey(seed)
    x = jnp.asarray(gop0)
    if codec_name.startswith("LSVC"):
        return model.init(key, x, training=False)
    if codec_name in ("DVC", "RLVC", "RLVC2"):
        H, W = x.shape[1], x.shape[2]
        state = model.init_state(1, H, W)
        return model.init(key, x[0][None], x[1][None], state, False,
                          training=False)
    if codec_name.startswith("SSF"):
        return model.init(key, x[1][None], x[0][None], training=False,
                          method=model.init_all)
    if codec_name.startswith("ELFVC"):
        H, W = x.shape[1], x.shape[2]
        state = model.init_state(1, H, W)
        return model.init(key, x[1][None], x[0][None], state, training=False)
    if codec_name.startswith("MCVC"):
        frames = x[:2, None]  # [G=2, V=1, H, W, 3]
        mask = jnp.ones((num_views,), jnp.float32)
        return model.init(key, jnp.tile(frames, (1, num_views, 1, 1, 1)),
                          mask, training=False)
    if codec_name.startswith("Base") or codec_name == "DVC-pretrained":
        # DVC-pretrained = the original-DVC topology (net.py:38), served by
        # BaseCodec (fvc.models.registry) with .model interop
        # (fvc.models.torch_interop)
        return model.init(key, x[1][None], x[0][None], training=False)
    raise ValueError(codec_name)


def eval_family_on_gops(codec_name: str, model, variables, gops, *,
                        real_bits: bool = False, bP: int = 0):
    """Per-GOP evaluation for every codec family — the reference
    static_simulation_model / parallel_compression family dispatch
    (eval.py:254-354, models.py:260-410) behind one uniform result schema:
    [{bpp, psnr, psnr_list, time_per_frame[, bpp_act]}].

    Conventions per family (matching each family's bitstream codec):
    - LSVC/DVC/RLVC/ELFVC: frame 0 is a given I-frame; bpp normalized by
      P-frame pixels.
    - SSF/MCVC: the keyframe is learned and coded (reference models.py:2310);
      bpp/psnr cover all frames.
    """
    from fvc.ops.math import bits_from_likelihood, psnr_per_frame

    name = codec_name
    if name.startswith("LSVC"):
        results = eval_lsvc_on_gops(model, variables, gops)
        if real_bits:
            from fvc.models.bitstream import LSVCBitstreamCodec
            codec = LSVCBitstreamCodec(model, variables)
            for g, r in zip(gops, results):
                streams, info = codec.compress(np.asarray(g))
                T, H, W = g.shape[0] - 1, g.shape[1], g.shape[2]
                r["bpp_act"] = codec.num_bits(streams) / (T * H * W)
        return results

    results = []
    if name in ("DVC", "RLVC", "RLVC2"):
        from fvc.gop.engine import code_gop_bidirectional, code_gop_scan

        H, W = gops[0].shape[1], gops[0].shape[2]
        state0 = model.init_state(1, H, W)

        def apply_fn(params, x_ref, x_cur, st, flag, *, training, rng):
            return model.apply(params, x_ref, x_cur, st, flag,
                               training=training, rng=rng)

        from fvc.ops.ms_ssim import ms_ssim_db_np

        @jax.jit
        def run(v, frames):
            if bP:
                # RLVC sliding window (train.py:266,321,346-357): I-frame at
                # index bP, bP backward P-frames coded on the time-reversed
                # prefix, the rest forward.
                recons, outs = code_gop_bidirectional(
                    apply_fn, v, frames, state0, training=False, mid=bP)
                tgt = jnp.concatenate(
                    [frames[bP::-1][1:], frames[bP:][1:]], axis=0)
            else:
                recons, outs = code_gop_scan(apply_fn, v, frames, state0,
                                             training=False)
                tgt = frames[1:]
            return (outs["bpp_est"], outs["psnr"],
                    outs.get("bpp_mv", jnp.zeros_like(outs["bpp_est"])),
                    outs.get("bpp_res", jnp.zeros_like(outs["bpp_est"])),
                    recons[:, 0], tgt[:, 0])

        codec = None
        if real_bits:
            if name == "DVC":
                from fvc.models.bitstream_dvc import DVCBitstreamCodec
                codec = DVCBitstreamCodec(model, variables)
            else:
                from fvc.models.bitstream_rlvc import RLVCBitstreamCodec
                codec = RLVCBitstreamCodec(model, variables)
        for g in gops:
            frames = jnp.asarray(g)[:, None]
            t0 = time.perf_counter()
            bpps, psnrs, bpps_mv, bpps_res, recons, tgt = run(variables,
                                                              frames)
            jax.block_until_ready(psnrs)
            dt = time.perf_counter() - t0
            if min(H, W) >= 176:  # 5-scale MS-SSIM window floor
                msssim = float(np.mean(ms_ssim_db_np(np.asarray(tgt),
                                                     np.asarray(recons))))
            else:
                msssim = float("nan")
            r = {"bpp": float(jnp.mean(bpps)), "psnr": float(jnp.mean(psnrs)),
                 "psnr_list": np.asarray(psnrs).tolist(),
                 "bpp_mv": float(jnp.mean(bpps_mv)),
                 "bpp_res": float(jnp.mean(bpps_res)),
                 "msssim_db": msssim,
                 "time_per_frame": dt / (g.shape[0] - 1)}
            if codec is not None:
                fr = np.asarray(frames)
                if bP:  # two windows sharing the mid I-frame
                    bits = (codec.num_bits(codec.compress(fr[bP:])[0])
                            + codec.num_bits(codec.compress(fr[bP::-1])[0]))
                else:
                    bits = codec.num_bits(codec.compress(fr)[0])
                r["bpp_act"] = bits / ((g.shape[0] - 1) * H * W)
            results.append(r)
        return results

    if name.startswith("SSF"):
        @jax.jit
        def key_run(v, x0):
            x0_hat, lk = model.apply(v, x0, training=False,
                                     method=model.forward_keyframe)
            bits = (bits_from_likelihood(lk["keyframe"]["y"])
                    + bits_from_likelihood(lk["keyframe"]["z"]))
            return x0_hat, bits

        @jax.jit
        def inter_run(v, x_cur, x_ref):
            from fvc.models.ssf import inter_bpp_est
            x_rec, lk = model.apply(v, x_cur, x_ref, training=False)
            bpp, _ = inter_bpp_est(lk, 1, 1, 1)  # raw bits (denom 1)
            return x_rec, bpp

        codec = None
        if real_bits:
            from fvc.models.bitstream_ssf import SSFBitstreamCodec
            codec = SSFBitstreamCodec(model, variables)
        for g in gops:
            x = jnp.asarray(g)
            T, H, W = x.shape[0], x.shape[1], x.shape[2]
            t0 = time.perf_counter()
            x_ref, bits = key_run(variables, x[0][None])
            recs = [x_ref[0]]
            for t in range(1, T):
                x_ref, b = inter_run(variables, x[t][None], x_ref)
                recs.append(x_ref[0])
                bits = bits + b
            jax.block_until_ready(x_ref)
            dt = time.perf_counter() - t0
            psnrs = psnr_per_frame(x, jnp.stack(recs))
            r = {"bpp": float(bits) / (T * H * W),
                 "psnr": float(jnp.mean(psnrs[1:])),
                 "psnr_list": np.asarray(psnrs).tolist(),
                 "time_per_frame": dt / T}
            if codec is not None:
                streams, _ = codec.compress(np.asarray(x)[:, None])
                r["bpp_act"] = codec.num_bits(streams) / (T * H * W)
            results.append(r)
        return results

    if name.startswith("Base") or name == "DVC-pretrained":
        # Base/-EC/-ER (models.py:1550): I-frame passthrough reference,
        # sequential P-frames; out dict carries bpp_est/psnr directly.
        codec = None
        if real_bits:
            if name == "DVC-pretrained":
                raise NotImplementedError(
                    "DVC-pretrained real bits: use --codec DVC --real-bits "
                    "(fvc/models/bitstream_dvc.py) — the torch-interop "
                    "architecture shares its coding path")
            # torchac calrealbits equivalent (models.py:1249-1299):
            # fvc/models/bitstream_base.py codes mv/z with the learned
            # factorized tables and the residual with sigma-indexed Laplace
            from fvc.models.bitstream_base import BaseBitstreamCodec
            codec = BaseBitstreamCodec(model, variables)

        @jax.jit
        def base_run(v, x_cur, x_ref):
            x_rec, out = model.apply(v, x_cur, x_ref, training=False)
            return x_rec, out["bpp_est"], out["psnr"]

        for g in gops:
            x = jnp.asarray(g)
            T, H, W = x.shape[0], x.shape[1], x.shape[2]
            x_ref = x[0][None]
            bpps, psnrs = [], []
            t0 = time.perf_counter()
            for t in range(1, T):
                x_ref, bpp, ps = base_run(variables, x[t][None], x_ref)
                bpps.append(float(bpp))
                psnrs.append(float(ps))
            jax.block_until_ready(x_ref)
            dt = time.perf_counter() - t0
            r = {"bpp": float(np.mean(bpps)), "psnr": float(np.mean(psnrs)),
                 "psnr_list": psnrs, "time_per_frame": dt / (T - 1)}
            if codec is not None:
                streams, _ = codec.compress(np.asarray(x)[:, None])
                # per-P-frame bpp, matching the bpp_est denominator above
                r["bpp_act"] = codec.num_bits(streams) / ((T - 1) * H * W)
            results.append(r)
        return results

    if name.startswith("ELFVC"):
        from fvc.models.ssf import inter_bpp_est

        H, W = gops[0].shape[1], gops[0].shape[2]
        state0 = model.init_state(1, H, W)

        @jax.jit
        def inter_run(v, x_cur, x_ref, st):
            x_rec, new_st, lk = model.apply(v, x_cur, x_ref, st,
                                            training=False)
            bpp, _ = inter_bpp_est(lk, 1, 1, 1)
            return x_rec, new_st, bpp

        codec = None
        if real_bits:
            from fvc.models.bitstream_elfvc import ELFVCBitstreamCodec
            codec = ELFVCBitstreamCodec(model, variables)
        for g in gops:
            x = jnp.asarray(g)
            T = x.shape[0]
            st = state0
            x_ref = x[0][None]
            recs = []
            bits = 0.0
            t0 = time.perf_counter()
            for t in range(1, T):
                x_ref, st, b = inter_run(variables, x[t][None], x_ref, st)
                recs.append(x_ref[0])
                bits = bits + b
            jax.block_until_ready(x_ref)
            dt = time.perf_counter() - t0
            psnrs = psnr_per_frame(x[1:], jnp.stack(recs))
            r = {"bpp": float(bits) / ((T - 1) * H * W),
                 "psnr": float(jnp.mean(psnrs)),
                 "psnr_list": np.asarray(psnrs).tolist(),
                 "time_per_frame": dt / (T - 1)}
            if codec is not None:
                streams, _ = codec.compress(np.asarray(x)[:, None])
                r["bpp_act"] = codec.num_bits(streams) / ((T - 1) * H * W)
            results.append(r)
        return results

    if name.startswith("MCVC"):
        from fvc.models.mcvc import mcvc_gop_metrics

        mask = jnp.ones((1,), jnp.float32)

        @jax.jit
        def run(v, frames):
            out = model.apply(v, frames, mask, training=False)
            return out

        codec = None
        if real_bits:
            from fvc.models.bitstream_mcvc import MCVCBitstreamCodec
            codec = MCVCBitstreamCodec(model, variables)
        for g in gops:
            frames = jnp.asarray(g)[:, None]  # views = 1
            T, H, W = g.shape[0], g.shape[1], g.shape[2]
            t0 = time.perf_counter()
            out = run(variables, frames)
            jax.block_until_ready(out["x_hat"])
            dt = time.perf_counter() - t0
            m = mcvc_gop_metrics(frames, out, model.config)
            psnrs = psnr_per_frame(frames[:, 0], out["x_hat"][:, 0])
            r = {"bpp": float(m["bpp_est"]), "psnr": float(m["psnr"]),
                 "psnr_list": np.asarray(psnrs).tolist(),
                 "time_per_frame": dt / T}
            if codec is not None:
                streams, _ = codec.compress(np.asarray(frames), np.ones((1,)))
                r["bpp_act"] = codec.num_bits(streams) / (T * H * W)
            results.append(r)
        return results

    raise ValueError(f"unknown codec family: {name}")

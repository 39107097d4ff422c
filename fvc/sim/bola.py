"""BOLA adaptive-bitrate streaming / QoE simulation.

Behavioral re-implementation of the reference's simulation.py (Lyapunov
rho-based level selection over network traces with a separate decode queue):
- BOLA parameter derivation from the rate ladder: simulation.py:208-228
- per-segment selection, download over piecewise-constant traces, decode-queue
  chaining and buffer dynamics: simulation.py:241-321
- outputs (QoE, mean quality, rebuffer ratio, stall frequency, mean bandwidth):
  simulation.py:327-345

Pure host-side Python/numpy — the experiment layer (L6) consuming per-level
(PSNR, bitrate, decode-time) ladders that eval produces.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


@dataclasses.dataclass
class BolaConfig:
    gop: int = 16
    fps: float = 30.0
    q_max: float = 60.0    # max buffer (s)
    q_low: float = 10.0    # low-buffer threshold (s)
    trace_dur: float = 10.0  # seconds per trace sample
    use_psnr_utility: bool = False  # reference default: log-bitrate utility
                                    # (simulation.py:354-356, psnr=False)

    @property
    def seg_duration(self) -> float:
        return self.gop / self.fps


def simulate_over_trace(all_psnr: np.ndarray, all_bitrate: np.ndarray,
                        all_dect: np.ndarray, downthrpt: Sequence[float],
                        latency: Sequence[float],
                        cfg: BolaConfig = BolaConfig()):
    """all_psnr/all_bitrate/all_dect: [levels, segments] ladders
    (bitrate in bps, decode time in s/segment). downthrpt: bps trace.
    Returns (QoE, mean_quality, rebuffer_ratio, stall_freq, mean_bw)."""
    p = cfg.seg_duration
    num_levels, num_segments = all_psnr.shape

    avail_bitrates = np.sort(all_bitrate.mean(axis=-1))
    avail_psnr = np.sort(all_psnr.mean(axis=-1))
    s1 = avail_bitrates[0] * p
    # degenerate ladders (single level, or equal measured bitrates) would put
    # s2 == s1 and poison alpha with a 0/0 -> the selection loop never
    # terminates; fall back to a 2x synthetic second rung
    s2 = (avail_bitrates[1] * p
          if num_levels > 1 and avail_bitrates[1] > avail_bitrates[0]
          else s1 * 2)
    if cfg.use_psnr_utility:
        v1, v2, v_max = avail_psnr[0], avail_psnr[min(1, num_levels - 1)], avail_psnr[-1]
    else:
        v1, v2 = 0.0, np.log(s2 / s1)
        v_max = np.log(avail_bitrates[-1] * p / s1)
    alpha = (s1 * v2 - s2 * v1) / (s2 - s1)
    V = (cfg.q_max - cfg.q_low) / (v_max + alpha)
    gamma = (v_max * cfg.q_low + alpha * cfg.q_max) / (cfg.q_max - cfg.q_low) / p

    remain = num_segments
    t_download = 0.0
    t_decode_end = 0.0
    curr_q = 0.0
    curr_real_q = 0.0
    quality_sum = 0.0
    stalls = 0
    trace_idx = 0

    while remain > 0:
        seg = num_segments - remain
        # Lyapunov rho per level; pick max nonnegative
        best_rho, level = -1e9, -1
        for lvl in range(num_levels):
            if cfg.use_psnr_utility:
                util = all_psnr[lvl, seg]
            else:
                util = np.log(all_bitrate[lvl, seg] / (s1 / p))
            rho = (V * util + V * gamma * p - curr_q) / (all_bitrate[lvl, seg] * p)
            if rho >= 0 and rho > best_rho:
                best_rho, level = rho, lvl
        if level < 0:
            # buffer too full: idle until rho can go nonnegative
            if cfg.use_psnr_utility:
                target = V * all_psnr[:, seg].max() + V * gamma * p
            else:
                target = V * np.log(all_bitrate[:, seg].max() / (s1 / p)) + V * gamma * p
            t_download += curr_q - target
            curr_q = target
            continue

        start = t_download
        remain_bits = all_bitrate[level, seg] * p
        while remain_bits > 0:
            trace_idx = min(int(t_download / cfg.trace_dur), len(downthrpt) - 1)
            trace_end = (trace_idx + 1) * cfg.trace_dur
            downloadable = (trace_end - t_download) * downthrpt[trace_idx]
            if downloadable >= remain_bits:
                t_download += remain_bits / downthrpt[trace_idx]
                remain_bits = 0
            else:
                t_download = trace_end
                remain_bits -= downloadable
        t_download += latency[trace_idx] if len(latency) else 0.0

        remain -= 1
        quality_sum += all_psnr[level, seg]
        # decode queue consumes downloaded segments
        last_dec = t_decode_end
        t_decode_end = max(t_decode_end, t_download) + all_dect[level, seg]
        if curr_real_q < (t_decode_end - last_dec):
            stalls += 1
        curr_q = p + max(curr_q - (t_decode_end - last_dec), 0.0)
        curr_real_q = p + max(curr_real_q - (t_decode_end - last_dec), 0.0)

    mean_bw = float(np.mean(np.asarray(downthrpt)[: trace_idx + 1]))
    finish_time = t_decode_end + curr_q
    # playout can never finish before N*p wall seconds; the buffer-level
    # approximation in finish_time can undershoot by <1 segment — clamp
    rebuffer_ratio = max(finish_time / (num_segments * p) - 1.0, 0.0)
    stall_freq = stalls / num_segments
    mean_quality = quality_sum / num_segments
    qoe = mean_quality - gamma * rebuffer_ratio
    return qoe, mean_quality, rebuffer_ratio, stall_freq, mean_bw


def load_fcc_trace_csv(path: str, *, field: str = "downthrpt",
                       latency_field: str = "latency",
                       max_samples: int = 50000):
    """FCC broadband trace loader (simulation.py:24-60): bytes/s -> bps,
    microseconds -> s, filtered to (1, 100) Mbps."""
    import csv

    down, lat = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            try:
                d = float(row[field]) * 8
                l = float(row.get(latency_field, 0) or 0) / 1e6
            except (ValueError, KeyError):
                continue
            if 1e6 < d < 100e6:
                down.append(d)
                lat.append(l)
            if len(down) >= max_samples:
                break
    return np.asarray(down), np.asarray(lat)


def parse_eval_logs(path: str, *, width: int, height: int,
                    fps: float = 30.0, gop: int = 16, segments: int = 200):
    """Build [levels, segments] (psnr, bitrate, decode-time) ladders from an
    eval log written by fvc.train.evaluate.write_eval_log — the reference's
    task_to_video_trace (simulation.py:113-204), which parses its own eval
    logs into per-segment ladders for BOLA.

    Records in one file are grouped by their codec tag (the eval CLI's RD
    sweep writes one record per level, tagged '{codec}-l{level}'); levels are
    ordered by bitrate. Per-frame PSNRs from the record cycle across segments;
    bitrate = bpp * W * H * fps."""
    def is_header(line):
        # header lines start with the codec tag (non-numeric); psnr lines are
        # all floats — a length test would misparse 5-entry psnr lists (GOP 6)
        try:
            float(line.split()[0])
            return False
        except ValueError:
            return True

    records = []  # (tag, bpp, psnr_mean, t_per_frame, psnr_list)
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i < len(lines):
        head = lines[i].split()
        tag, bpp, psnr_mean, tpf = (head[0], float(head[2]), float(head[3]),
                                    float(head[4]))
        psnr_list = []
        i += 1
        while i < len(lines) and not is_header(lines[i]):
            psnr_list += [float(v) for v in lines[i].split()]
            i += 1
        records.append((tag, bpp, psnr_mean, tpf, psnr_list or [psnr_mean]))

    # one ladder level per distinct tag, averaged over that tag's records
    tags = sorted({r[0] for r in records},
                  key=lambda t: (float(np.mean([r[1] for r in records
                                                if r[0] == t])), t))
    all_psnr = np.zeros((len(tags), segments))
    all_bitrate = np.zeros((len(tags), segments))
    all_dect = np.zeros((len(tags), segments))
    for lvl, tag in enumerate(tags):
        rs = [r for r in records if r[0] == tag]
        bpp = float(np.mean([r[1] for r in rs]))
        tpf = float(np.mean([r[3] for r in rs]))
        plist = np.concatenate([r[4] for r in rs])
        all_psnr[lvl] = np.resize(plist, segments)
        all_bitrate[lvl] = bpp * width * height * fps
        all_dect[lvl] = tpf * gop
    return all_psnr, all_bitrate, all_dect, tags

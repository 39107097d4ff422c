"""Telemetry: AverageMeter + the reference's per-stage timing taxonomy.

Reference: AverageMeter (models.py:1414-1430) and the meter dict
E-FL/E-MV/eEMV/E-MC/E-RES/D-MV/D-RES/... (models.py:81-86) that the papers
report. On TPU, per-stage device time comes from jax.profiler or from timed
jitted sub-functions (fvc.bench); these meters aggregate either source.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


STAGE_METERS = ("E-FL", "E-MV", "eEMV", "E-MC", "E-RES", "eERES", "E-NET",
                "D-MV", "eDMV", "D-MC", "D-RES", "eDRES", "D-NET")


def make_stage_meters() -> Dict[str, AverageMeter]:
    return {k: AverageMeter() for k in STAGE_METERS}


@contextlib.contextmanager
def timed(meter: AverageMeter):
    t0 = time.perf_counter()
    yield
    meter.update(time.perf_counter() - t0)


def encode_decode_summary(meters: Dict[str, AverageMeter]):
    """encoding_time / decoding_time aggregates (models.py:1019-1022)."""
    enc = sum(meters[k].avg for k in
              ("E-FL", "E-MV", "E-MC", "E-RES", "D-MV", "D-MC", "D-RES"))
    dec = sum(meters[k].avg for k in ("D-MV", "D-MC", "D-RES"))
    return enc, dec

"""Hard-corpus calibration gates (round-5, VERDICT r04 missing #2).

The easy corpus let DVC code GOP residuals at 0.0016 bpp — RD numbers on it
cannot falsify quality claims. These tests pin the properties that make the
hard corpus evidentially useful, so a future generator tweak cannot silently
regress them.
"""

import numpy as np

from fvc.data.datasets import SyntheticVideoDataset


def _clips(profile, n=2, frames=4, seed=9000):
    ds = SyntheticVideoDataset(num_videos=n, frames=frames, height=256,
                               width=256, seed=seed, profile=profile)
    return [ds[i] for i in range(n)]


def test_hard_corpus_intra_anchor_rate():
    """MJPEG/DCT anchor must need real-video-like rates: >= 0.2 bpp around
    30 dB (reference UVG anchor curves, plot_hermes.py:755-769). On the easy
    corpus the same anchor hits 30 dB far cheaper."""
    from fvc.anchors.mjpeg import compress_video

    rows = [compress_video(c.astype(np.float32), 10) for c in _clips("hard")]
    bpp = float(np.mean([r["bpp"] for r in rows]))
    psnr = float(np.mean([r["psnr"] for r in rows]))
    assert psnr <= 33.0, psnr  # q=10 sits near the 30 dB operating point
    assert bpp >= 0.25, (bpp, psnr)


def test_hard_corpus_temporal_innovation_floor():
    """Per-frame UNPREDICTABLE innovation must be present: independent
    sensor noise puts a floor under every predictor's residual, so codecs
    face a real rate-distortion tradeoff (on the easy corpus a good warp
    left ~nothing to code — 0.0016 bpp residuals). The median per-pixel
    squared temporal difference is a robust floor estimate (moving-edge
    outliers live in the tail): it must be >= ~1.5 sigma^2 of the injected
    noise (two independent noise fields per difference give 2 sigma^2;
    clipping at [0,1] eats a little)."""
    hard = _clips("hard", n=2)
    for c in hard:
        med = float(np.median((c[1:] - c[:-1]) ** 2))
        assert med >= 1.4e-4, med  # sigma = 0.01


def test_hard_corpus_deterministic_and_cached():
    """Same (seed, idx, params) -> identical clip, including through the
    disk cache (a non-deterministic generator would desync train pools
    across driver chunk restarts)."""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        os.environ["FVC_SYNTH_CACHE"] = td
        try:
            ds1 = SyntheticVideoDataset(num_videos=1, frames=3, height=64,
                                        width=64, seed=5, profile="hard")
            a = ds1[0]          # generates + writes cache
            b = ds1[0]          # reads cache
            ds2 = SyntheticVideoDataset(num_videos=1, frames=3, height=64,
                                        width=64, seed=5, profile="hard")
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(a, ds2[0])
        finally:
            os.environ.pop("FVC_SYNTH_CACHE", None)


def test_train_eval_seed_disjointness():
    """Training pools draw seeds seed+0..63; eval clips use seed 9000+ —
    the clip sets must differ (round-4's eval clips WERE training clips)."""
    train = SyntheticVideoDataset(num_videos=1, frames=3, height=64,
                                  width=64, seed=0, profile="hard")[0]
    ev = SyntheticVideoDataset(num_videos=1, frames=3, height=64,
                               width=64, seed=9000, profile="hard")[0]
    assert float(np.mean((train - ev) ** 2)) > 1e-3

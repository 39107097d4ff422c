"""Real-bitstream roundtrip tests: decode(encode(GOP)) must reproduce the
encoder-side reconstruction exactly, and actual bits must track estimates
(the reference invariants, entropy_models.py:414-459)."""

import numpy as np
import jax
import jax.numpy as jnp

from fvc.core.config import CodecConfig


def test_lsvc_real_bitstream_roundtrip():
    from fvc.models.lsvc import LSVC
    from fvc.models.bitstream import (
        LSVCBitstreamCodec, pack_streams, unpack_streams,
    )

    cfg = CodecConfig.from_name("LSVC")
    model = LSVC(cfg)
    rng = np.random.RandomState(0)
    gop, H, W = 4, 64, 64
    x = np.clip(rng.rand(gop + 1, H, W, 3), 0, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)

    codec = LSVCBitstreamCodec(model, variables)
    streams, info = codec.compress(x)
    assert all(len(v) > 0 for v in streams.values())

    decoded = codec.decompress(x[0], streams, info)
    np.testing.assert_allclose(decoded, info["recon"], atol=1e-5)

    # actual bits vs estimate: compare with the forward's bits_est
    _, out = model.apply(variables, jnp.asarray(x), training=False)
    est_bits = float(out["bpp_est"]) * gop * H * W
    act_bits = codec.num_bits(streams)
    assert act_bits < est_bits * 1.3 + 2048, (act_bits, est_bits)

    # container pack/unpack
    blob = pack_streams(streams)
    streams2 = unpack_streams(blob)
    assert streams2 == streams


def test_lsvc_decode_matches_eval_forward():
    """The synthesis-only decode path must agree with the standard eval
    forward's reconstructions (same rounding everywhere)."""
    from fvc.models.lsvc import LSVC
    from fvc.models.bitstream import LSVCBitstreamCodec

    cfg = CodecConfig.from_name("LSVC")
    model = LSVC(cfg)
    rng = np.random.RandomState(1)
    x = np.clip(rng.rand(3, 64, 64, 3), 0, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)

    com_eval, _ = model.apply(variables, jnp.asarray(x), training=False)

    codec = LSVCBitstreamCodec(model, variables)
    streams, info = codec.compress(x)
    decoded = codec.decompress(x[0], streams, info)
    np.testing.assert_allclose(decoded, np.asarray(com_eval), atol=1e-5)


def test_dvc_real_bitstream_roundtrip():
    from fvc.models.dvc import IterPredCodec
    from fvc.models.bitstream_dvc import DVCBitstreamCodec

    cfg = CodecConfig.from_name("DVC", channels=32)
    model = IterPredCodec(cfg)
    rng = np.random.RandomState(2)
    T, B, H, W = 4, 1, 64, 64
    frames = np.clip(rng.rand(T, B, H, W, 3), 0, 1).astype(np.float32)
    state = model.init_state(B, H, W)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[0]),
                           jnp.asarray(frames[1]), state, False, training=False)

    codec = DVCBitstreamCodec(model, variables)
    streams, info = codec.compress(frames)
    assert all(len(v) > 0 for v in streams.values())
    decoded = codec.decompress(frames[0], streams, info)
    np.testing.assert_allclose(decoded, info["recon"], atol=1e-5)
    assert decoded.shape == (T - 1, B, H, W, 3)


def test_base_real_bitstream_roundtrip():
    """Base family (torchac calrealbits equivalent, models.py:1249-1299):
    mv/z factorized + sigma-indexed Laplace residual; decode must reproduce
    the encoder-side reconstruction exactly. Runs the -EC variant so the
    correction-channel split is exercised too."""
    from fvc.models.base_codec import BaseCodec
    from fvc.models.bitstream_base import BaseBitstreamCodec

    for name in ("Base", "Base-EC"):
        cfg = CodecConfig.from_name(name)
        model = BaseCodec(cfg)
        rng = np.random.RandomState(4)
        T, B, H, W = 3, 1, 64, 64
        frames = np.clip(rng.rand(T, B, H, W, 3), 0, 1).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[1]),
                               jnp.asarray(frames[0]), training=False)

        codec = BaseBitstreamCodec(model, variables)
        streams, info = codec.compress(frames)
        assert all(len(v) > 0 for v in streams.values()), name
        decoded = codec.decompress(frames[0], streams, info)
        np.testing.assert_allclose(decoded, info["recon"], atol=1e-5)
        assert decoded.shape == (T - 1, B, H, W, 3)

        # actual bits track the forward's estimate (entropy_models.py:414-459
        # invariant; generous bound at fresh init)
        _, out = model.apply(variables, jnp.asarray(frames[1]),
                             jnp.asarray(frames[0]), training=False)
        est_bits = float(out["bpp_est"]) * B * H * W * (T - 1)
        assert codec.num_bits(streams) < est_bits * 1.3 + 4096, name


def test_rlvc_real_bitstream_roundtrip():
    """RPM-conditioned sequential real coding: per-frame streams, decoder
    RPM chain driven by previously-decoded latents; reconstructions must match
    the encoder's exactly."""
    from fvc.models.dvc import IterPredCodec
    from fvc.models.bitstream_rlvc import RLVCBitstreamCodec

    cfg = CodecConfig.from_name("RLVC", channels=32)
    model = IterPredCodec(cfg)
    rng = np.random.RandomState(3)
    T, B, H, W = 4, 1, 64, 64
    frames = np.clip(rng.rand(T, B, H, W, 3), 0, 1).astype(np.float32)
    state = model.init_state(B, H, W)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[0]),
                           jnp.asarray(frames[1]), state, False, training=False)

    codec = RLVCBitstreamCodec(model, variables)
    streams, info = codec.compress(frames)
    assert len(streams) == T - 1
    assert all(len(s["mv"]) > 0 and len(s["res"]) > 0 for s in streams)
    decoded = codec.decompress(frames[0], streams, info)
    np.testing.assert_allclose(decoded, info["recon"], atol=1e-5)


def test_ssf_real_bitstream_roundtrip():
    """SSF-family (keyframe + motion/residual hyperpriors) real coding."""
    from fvc.models.ssf import ScaleSpaceFlow
    from fvc.models.bitstream_ssf import SSFBitstreamCodec

    m = ScaleSpaceFlow(planes=32, mid=16)
    rng = np.random.RandomState(4)
    T, B, H, W = 3, 1, 128, 128
    frames = np.clip(rng.rand(T, B, H, W, 3), 0, 1).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(frames[1]),
                       jnp.asarray(frames[0]), training=False,
                       method=ScaleSpaceFlow.init_all)

    codec = SSFBitstreamCodec(m, variables)
    streams, info = codec.compress(frames)
    assert len(streams["inter"]) == T - 1
    x0_hat, decoded = codec.decompress(streams, info)
    np.testing.assert_allclose(x0_hat, info["x0_hat"], atol=1e-5)
    np.testing.assert_allclose(decoded, info["recons"], atol=1e-5)
    assert codec.num_bits(streams) > 0


def test_elfvc_sp_real_bitstream_roundtrip():
    """Vesper real coding incl. super-precision: decoder rebuilds SPnet
    predictions from decoded latents; recon must match the encoder-side chain
    and the model's own eval forward."""
    from fvc.models.elfvc import ELFVC
    from fvc.models.bitstream_elfvc import ELFVCBitstreamCodec

    cfg = CodecConfig.from_name("ELFVC-SP", sp_stage=1)
    model = ELFVC(cfg, planes=32, mid=16)
    rng = np.random.RandomState(5)
    T, B, H, W = 3, 1, 128, 128
    frames = np.clip(rng.rand(T, B, H, W, 3), 0, 1).astype(np.float32)
    state = model.init_state(B, H, W)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames[1]),
                           jnp.asarray(frames[0]), state, training=False)

    codec = ELFVCBitstreamCodec(model, variables)
    streams, info = codec.compress(frames)
    decoded = codec.decompress(frames[0], streams, info)
    np.testing.assert_allclose(decoded, info["recon"], atol=1e-5)

    # cross-check frame 1 against the model's own eval forward
    x_rec, _, _ = model.apply(variables, jnp.asarray(frames[1]),
                              jnp.asarray(frames[0]), state, training=False)
    np.testing.assert_allclose(decoded[0], np.asarray(x_rec), atol=1e-4)


def test_mcvc_real_bitstream_roundtrip():
    """Multi-camera real coding: masks ride as side info; '-IA' backup
    decoders reuse the same latents for resilient reconstruction."""
    from fvc.models.mcvc import MCVC, sample_view_mask
    from fvc.models.bitstream_mcvc import MCVCBitstreamCodec

    views = 3
    cfg = CodecConfig.from_name("MCVC-IA", num_views=views, resilience=1)
    model = MCVC(cfg, planes=32, mid=16)
    rng = np.random.RandomState(6)
    G, H, W = 2, 128, 128
    frames = np.clip(rng.rand(G, views, H, W, 3), 0, 1).astype(np.float32)
    mask = np.asarray(sample_view_mask(1, views, 1, force_resilience=1,
                                       training=True,
                                       rng=np.random.RandomState(0)),
                      np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(frames),
                           jnp.asarray(mask), training=False)

    codec = MCVCBitstreamCodec(model, variables)
    streams, info = codec.compress(frames, mask)
    recons, enhanced = codec.decompress(streams, info)
    np.testing.assert_allclose(recons, info["recons"], atol=1e-5)
    assert enhanced.shape == (G, views, H, W, 3)
    assert codec.num_bits(streams) > 0


def test_lsvc_pipelined_compress_matches_sequential():
    """compress_pipelined overlaps device transforms with host rANS coding
    (SURVEY §7 'Real entropy coding on TPU'); streams must be bit-identical
    to per-GOP compress()."""
    from fvc.models.lsvc import LSVC
    from fvc.models.bitstream import LSVCBitstreamCodec

    rng = np.random.RandomState(3)
    gop, H, W = 2, 64, 64
    gops = [np.clip(rng.rand(gop + 1, H, W, 3), 0, 1).astype(np.float32)
            for _ in range(3)]
    cfg = CodecConfig.from_name("LSVC")
    model = LSVC(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(gops[0]),
                           training=False)
    codec = LSVCBitstreamCodec(model, variables)

    seq = [codec.compress(g) for g in gops]
    pipe = codec.compress_pipelined(gops)
    assert len(pipe) == len(seq)
    for (s_seq, i_seq), (s_pipe, i_pipe) in zip(seq, pipe):
        assert set(s_seq) == set(s_pipe)
        for k in s_seq:
            assert s_seq[k] == s_pipe[k], k
        np.testing.assert_array_equal(i_seq["recon"], i_pipe["recon"])

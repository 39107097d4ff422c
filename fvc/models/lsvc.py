"""LSVC ("Hermes") — batch-parallel tree-structured GOP codec.

Reference: models.py:1157-1411. All P-frames of a GOP are coded as ONE batch:
batched SpyNet flow against each frame's tree parent, one batched motion codec,
then layer-by-layer motion-compensation + residual coding down the reference
tree (O(log GOP) sequential steps, each step fully batched).

TPU mapping (SURVEY §2.5): the per-layer batch is the parallel axis — it shards
across devices under pjit; the only cross-layer dependency is the parent
reconstructions, which are gathered with static indices (graphs are
compile-time constants).

Transforms are the DVC subnets (DVC/subnet/analysis*.py, synthesis*.py):
- mv:   8-layer conv stack, ch 128 (out_channel_mv), alternating s2/s1, LeakyReLU(0.1)
- res:  4x (k5 s2 conv + GDN) to ch 96 (out_channel_M), mirrored decoder
- hyper: abs -> s1 conv -> 2x s2 conv (ch 64); decoder ends in exp() (sigma)
Entropy: Laplace(0, sigma) for residual latent; learned factorized (Bitparm)
CDFs for mv latent and hyper z (models.py:1216-1299).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.core.config import CodecConfig, OUT_CHANNEL_M, OUT_CHANNEL_N, OUT_CHANNEL_MV
from fvc.entropy.bitparm import BitEstimator
from fvc.gop.graphs import graph_from_batch, pruned_layers, ref_index_from_graph
from fvc.ops.blocks import WarpNet
from fvc.ops.conv import Conv, Deconv
from fvc.ops.gdn import GDN
from fvc.ops.math import (
    bits_from_likelihood, laplace_interval_likelihood, psnr_per_frame, quantize,
)
from fvc.ops.spynet import SpyNet
from fvc.ops.warp import flow_warp


class MVAnalysis(nn.Module):
    """Analysis_mv_net (DVC/subnet/analysis_mv.py:8-82)."""

    channels: int = OUT_CHANNEL_MV

    @nn.compact
    def __call__(self, x):
        c = self.channels
        for stride in (2, 1, 2, 1, 2, 1, 2):
            x = jax.nn.leaky_relu(Conv(c, kernel=3, stride=stride)(x), 0.1)
        return Conv(c, kernel=3)(x)


class MVSynthesis(nn.Module):
    """Synthesis_mv_net (DVC/subnet/synthesis_mv.py:9-79)."""

    channels: int = OUT_CHANNEL_MV

    @nn.compact
    def __call__(self, x):
        c = self.channels
        for _ in range(3):
            x = jax.nn.leaky_relu(Deconv(c, kernel=3)(x), 0.1)
            x = jax.nn.leaky_relu(Conv(c, kernel=3)(x), 0.1)
        x = jax.nn.leaky_relu(Deconv(c, kernel=3)(x), 0.1)
        return Conv(2, kernel=3)(x)


class ResAnalysis(nn.Module):
    """Analysis_net (DVC/subnet/analysis.py:10-60); optional space-time attention."""

    conv_channels: int = OUT_CHANNEL_N
    out_channels: int = OUT_CHANNEL_M
    use_attn: bool = False

    @nn.compact
    def __call__(self, x):
        x = GDN()(Conv(self.conv_channels, kernel=5, stride=2)(x))
        x = GDN()(Conv(self.conv_channels, kernel=5, stride=2)(x))
        x = GDN()(Conv(self.conv_channels, kernel=5, stride=2)(x))
        x = Conv(self.out_channels, kernel=5, stride=2)(x)
        if self.use_attn:
            from fvc.models.st_attention import SpaceTimeAttentionStack
            x = SpaceTimeAttentionStack(self.out_channels)(x)
        return x


class ResSynthesis(nn.Module):
    """Synthesis_net (DVC/subnet/synthesis.py:8-58)."""

    conv_channels: int = OUT_CHANNEL_N
    in_channels: int = OUT_CHANNEL_M
    use_attn: bool = False

    @nn.compact
    def __call__(self, x):
        if self.use_attn:
            from fvc.models.st_attention import SpaceTimeAttentionStack
            x = SpaceTimeAttentionStack(self.in_channels)(x)
        x = GDN(inverse=True)(Deconv(self.conv_channels, kernel=5)(x))
        x = GDN(inverse=True)(Deconv(self.conv_channels, kernel=5)(x))
        x = GDN(inverse=True)(Deconv(self.conv_channels, kernel=5)(x))
        return Deconv(3, kernel=5)(x)


class PriorAnalysis(nn.Module):
    """Analysis_prior_net (DVC/subnet/analysis_prior.py:10-56): abs -> convs."""

    conv_channels: int = OUT_CHANNEL_N

    @nn.compact
    def __call__(self, x):
        x = jnp.abs(x)
        x = jax.nn.relu(Conv(self.conv_channels, kernel=3, stride=1)(x))
        x = jax.nn.relu(Conv(self.conv_channels, kernel=5, stride=2)(x))
        return Conv(self.conv_channels, kernel=5, stride=2)(x)


class PriorSynthesis(nn.Module):
    """Synthesis_prior_net (DVC/subnet/synthesis_prior.py:11-58): ... -> exp = sigma."""

    conv_channels: int = OUT_CHANNEL_N
    out_channels: int = OUT_CHANNEL_M

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Deconv(self.conv_channels, kernel=5)(x))
        x = jax.nn.relu(Deconv(self.conv_channels, kernel=5)(x))
        x = Conv(self.out_channels, kernel=3, stride=1)(x)
        # clamp the exponent: sigma saturates at the likelihood clip (1e10)
        # far below e^50, and an unbounded exp overflows f32 -> NaN training
        return jnp.exp(jnp.minimum(x, 50.0))


class LSVC(nn.Module):
    config: CodecConfig

    def setup(self):
        cfg = self.config
        ch = cfg.channels  # mv latent channels: 128 ('-128') or out_channel_M
        self.optic_flow = SpyNet()
        self.mv_encoder = MVAnalysis(channels=ch)
        self.mv_decoder = MVSynthesis(channels=ch)
        self.res_encoder = ResAnalysis(use_attn=cfg.use_attn)
        self.res_decoder = ResSynthesis(use_attn=cfg.use_syn_attn)
        self.prior_encoder = PriorAnalysis()
        self.prior_decoder = PriorSynthesis()
        self.bit_estimator_mv = BitEstimator(ch)
        self.bit_estimator_z = BitEstimator(OUT_CHANNEL_N)
        self.warpnet = WarpNet()

    def _mv_codec(self, estmv, *, training: bool, rng):
        feat = self.mv_encoder(estmv)
        q = quantize(feat, training, rng)
        mv_hat = self.mv_decoder(q)
        p = self.bit_estimator_mv(q + 0.5) - self.bit_estimator_mv(q - 0.5)
        return mv_hat, bits_from_likelihood(p)

    def _res_codec(self, res, *, training: bool, rng):
        r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
        feat = self.res_encoder(res)
        z = self.prior_encoder(feat)
        z_hat = quantize(z, training, r1)
        sigma = self.prior_decoder(z_hat)
        feat_hat = quantize(feat, training, r2)
        res_hat = self.res_decoder(feat_hat)
        p_feat = laplace_interval_likelihood(feat_hat, sigma)
        p_z = self.bit_estimator_z(z_hat + 0.5) - self.bit_estimator_z(z_hat - 0.5)
        bits = bits_from_likelihood(p_feat) + bits_from_likelihood(p_z)
        return res_hat, bits

    def __call__(self, x, *, training: bool, rng=None):
        """x: [GOP+1, H, W, 3] — frame 0 is the reconstructed I-frame.
        Returns (com_frames [GOP,H,W,3], out dict). Mirrors LSVC.forward
        (models.py:1347-1411)."""
        cfg = self.config
        bs = x.shape[0] - 1
        H, W = x.shape[1], x.shape[2]
        if H % 64 or W % 64:
            raise ValueError(
                f"LSVC needs H,W divisible by 64 (16x transforms + 4x hyper), "
                f"got {H}x{W} — pad/crop the input (eval.py pads GOP tails)")
        g, layers, parents = graph_from_batch(
            bs, linear=cfg.linear_chain, onehop=cfg.one_hop)
        ref_index = ref_index_from_graph(g, bs)
        layers = pruned_layers(layers, bs)

        r_mv, r_res = (jax.random.split(rng) if rng is not None
                       else (None, None))

        # batched flow: every P-frame against its tree parent (models.py:1354)
        target = x[1:]
        refs = x[jnp.asarray(ref_index)]
        estmv = self.optic_flow(target, refs)
        mv_hat, bits_mv = self._mv_codec(estmv, training=training, rng=r_mv)

        # layer-by-layer tree reconstruction. The graph is a compile-time
        # constant, so per-frame reconstructions live in a Python list and
        # stack ONCE at the end — a `.at[idx].set` scatter per layer lowers
        # to TPU scatter ops (serialized per index) and was a measurable
        # slice of the program's data-formatting time.
        com_f = [None] * bs
        mc_f = [None] * bs
        warped_f = [None] * bs
        bits_res = 0.0
        res_rngs = (jax.random.split(r_res, len(layers))
                    if r_res is not None else [None] * len(layers))
        for li, layer in enumerate(layers):
            idx = jnp.asarray([t - 1 for t in layer])
            par = [parents[t] for t in layer]
            # parent 0 = I-frame x[0]; else previous-layer reconstruction
            ref_stack = jnp.stack([
                x[0] if p == 0 else com_f[p - 1] for p in par], axis=0)
            if cfg.detach_tree_refs:
                ref_stack = jax.lax.stop_gradient(ref_stack)
            mv_l = mv_hat[idx]
            tgt_l = target[idx]
            warped = flow_warp(ref_stack, mv_l)
            mc = self.warpnet(jnp.concatenate(
                [warped, ref_stack.astype(warped.dtype)], axis=-1)) + warped
            res = tgt_l - mc
            res_hat, bits_l = self._res_codec(res, training=training, rng=res_rngs[li])
            com_l = jnp.clip(res_hat + mc, 0.0, 1.0)
            for i, t in enumerate(layer):
                com_f[t - 1] = com_l[i]
                mc_f[t - 1] = mc[i]
                warped_f[t - 1] = warped[i]
            bits_res = bits_res + bits_l
        # match the pre-rewrite scatter semantics: updates were upcast into
        # an f32 buffer, so metrics/losses stay f32 under the bf16 policy
        com = jnp.stack(com_f).astype(target.dtype)
        mc_all = jnp.stack(mc_f).astype(target.dtype)
        warped_all = jnp.stack(warped_f).astype(target.dtype)

        denom = float(bs * H * W)
        out = {
            "rec_loss": jnp.mean(jnp.square(com - target)),
            "warp_loss": jnp.mean(jnp.square(warped_all - target)),
            "mc_loss": jnp.mean(jnp.square(mc_all - target)),
            "bpp_res": bits_res / denom,
            "bpp_mv": bits_mv / denom,
            "bpp_est": (bits_res + bits_mv) / denom,
            "psnr": jnp.mean(psnr_per_frame(target, com)),
            "psnr_list": psnr_per_frame(target, com),
            "mc_frames": mc_all,
        }
        return com, out

    # ------------------------------------------------------------------
    # Real-bitstream halves (TreeFrameReconCompress/Decompress equivalents,
    # models.py:1095-1152): the device computes rounded latents + sigma; the
    # host rANS-codes them (fvc.models.bitstream).
    # ------------------------------------------------------------------

    def collect_latents(self, x):
        """Eval forward that returns every rounded latent needed to rebuild
        the GOP: mv_q [bs,h/16,w/16,ch], z_q [bs,h/64,w/64,64],
        feat_q [bs,h/16,w/16,96], plus recon for verification."""
        cfg = self.config
        bs = x.shape[0] - 1
        g, layers, parents = graph_from_batch(
            bs, linear=cfg.linear_chain, onehop=cfg.one_hop)
        ref_index = ref_index_from_graph(g, bs)
        layers = pruned_layers(layers, bs)

        target = x[1:]
        refs = x[jnp.asarray(ref_index)]
        estmv = self.optic_flow(target, refs)
        mv_q = jnp.round(self.mv_encoder(estmv))
        mv_hat = self.mv_decoder(mv_q)

        com_f = [None] * bs
        z_list = [None] * bs
        feat_list = [None] * bs
        for layer in layers:
            idx = jnp.asarray([t - 1 for t in layer])
            ref_stack = jnp.stack(
                [x[0] if parents[t] == 0 else com_f[parents[t] - 1]
                 for t in layer])
            warped = flow_warp(ref_stack, mv_hat[idx])
            mc = self.warpnet(jnp.concatenate(
                [warped, ref_stack.astype(warped.dtype)], axis=-1)) + warped
            res = target[idx] - mc
            feat = self.res_encoder(res)
            z_q = jnp.round(self.prior_encoder(feat))
            feat_q = jnp.round(feat)
            res_hat = self.res_decoder(feat_q)
            com_l = jnp.clip(res_hat + mc, 0.0, 1.0)
            for i, t in enumerate(layer):
                com_f[t - 1] = com_l[i]
                z_list[t - 1] = z_q[i]
                feat_list[t - 1] = feat_q[i]
        return {"mv_q": mv_q, "z_q": jnp.stack(z_list),
                "feat_q": jnp.stack(feat_list),
                "recon": jnp.stack(com_f).astype(x.dtype)}

    def sigma_of_z(self, z_q):
        return self.prior_decoder(z_q)

    def reconstruct(self, x0, mv_q, feat_q):
        """Decode-side tree reconstruction from entropy-decoded latents."""
        cfg = self.config
        bs = mv_q.shape[0]
        g, layers, parents = graph_from_batch(
            bs, linear=cfg.linear_chain, onehop=cfg.one_hop)
        layers = pruned_layers(layers, bs)
        mv_hat = self.mv_decoder(mv_q)
        com_f = [None] * bs
        for layer in layers:
            idx = jnp.asarray([t - 1 for t in layer])
            ref_stack = jnp.stack(
                [x0 if parents[t] == 0 else com_f[parents[t] - 1]
                 for t in layer])
            warped = flow_warp(ref_stack, mv_hat[idx])
            mc = self.warpnet(jnp.concatenate(
                [warped, ref_stack.astype(warped.dtype)], axis=-1)) + warped
            res_hat = self.res_decoder(feat_q[idx])
            com_l = jnp.clip(res_hat + mc, 0.0, 1.0)
            for i, t in enumerate(layer):
                com_f[t - 1] = com_l[i]
        return jnp.stack(com_f).astype(x0.dtype)

    def mv_cdf(self, x):
        return self.bit_estimator_mv(x)

    def z_cdf(self, x):
        return self.bit_estimator_z(x)

"""Codec factory — get_codec_model equivalent (models.py:32-66) with a uniform
interface instead of the reference's per-family forward signatures (the L4->L3
design wart called out in SURVEY §1)."""

from __future__ import annotations

from fvc.core.config import CodecConfig


def get_codec_model(name: str, **kw):
    """Returns (module, config). Module families:

    - DVC / RLVC / RLVC2            -> IterPredCodec (per-frame, scan over GOP)
    - LSVC[-A/-S/-L/-O/-D/-128]     -> LSVC (batched tree GOP forward)
    - Base[-EC/-ER]                 -> BaseCodec (per-frame)
    - SSF                           -> ScaleSpaceFlow (per-frame inter)
    - ELFVC[-SP]                    -> ELFVC (per-frame inter with state)
    - MCVC-Original / MCVC-IA[-OLFT]-> MCVC (multiview GOP forward)
    - IFrame                        -> IFrameCodec (intra)
    """
    import dataclasses
    fields = {f.name for f in dataclasses.fields(CodecConfig)}
    extra = {k: v for k, v in kw.items() if k not in fields}
    kw = {k: v for k, v in kw.items() if k in fields}
    cfg = CodecConfig.from_name(name, **kw)
    if name in ("DVC", "RLVC", "RLVC2"):
        from fvc.models.dvc import IterPredCodec
        return IterPredCodec(cfg), cfg
    if name == "DVC-pretrained":
        # the original-DVC architecture (hyperprior residual + factorized mv,
        # DVC/net.py:38): BaseCodec without EC/ER is exactly that topology
        from fvc.models.base_codec import BaseCodec
        return BaseCodec(cfg), cfg
    if name.startswith("LSVC"):
        from fvc.models.lsvc import LSVC
        return LSVC(cfg), cfg
    if name.startswith("Base"):
        from fvc.models.base_codec import BaseCodec
        return BaseCodec(cfg), cfg
    if name.startswith("ELFVC"):
        from fvc.models.elfvc import ELFVC
        return ELFVC(cfg), cfg
    if name.startswith("MCVC"):
        from fvc.models.mcvc import MCVC
        return MCVC(cfg, use_attn=extra.get("use_attn", True)), cfg
    if name in ("SSF", "SSF-Official"):
        from fvc.models.ssf import ScaleSpaceFlow
        return ScaleSpaceFlow(), cfg
    if name == "IFrame":
        from fvc.models.iframe import IFrameCodec
        return IFrameCodec(), cfg
    raise ValueError(f"unknown codec: {name}")

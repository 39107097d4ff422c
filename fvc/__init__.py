"""fvc — a TPU-native learned video codec framework (JAX/XLA/Pallas/pjit).

Re-implements the capabilities of BoChenUIUC/FastVideoCodec (reference at
/root/reference, see SURVEY.md) as an idiomatic JAX framework:

- ``fvc.ops``      — neural building blocks (GDN, warping, SpyNet, ConvLSTM, MS-SSIM)
- ``fvc.entropy``  — entropy models (factorized CDF, hyperprior, RPM) + native rANS coder
- ``fvc.models``   — codec model zoo (DVC/RLVC, LSVC tree codec, SSF, ELFVC-SP, MCVC-IA)
- ``fvc.gop``      — GOP orchestration (scan-based sequential coding, tree graphs)
- ``fvc.dist``     — device mesh / sharding policies for multi-chip TPU
- ``fvc.train``    — training loops, rate ladders, checkpointing
- ``fvc.data``     — dataset pipelines (Vimeo/UVG/MMPTracking + synthetic)
- ``fvc.anchors``  — x264/x265/BPG subprocess anchors
- ``fvc.sim``      — BOLA ABR / QoE streaming simulation

All tensors are NHWC (batch, height, width, channels) unless stated otherwise.
"""

__version__ = "0.1.0"

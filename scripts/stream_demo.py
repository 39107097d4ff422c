#!/usr/bin/env python
"""Networked encode/decode demo: real LSVC bitstreams over TCP.

The reference's benchmark.sh history ran networked client/server tests
behind tc-qdisc netem lines (benchmark.sh:1-40); this is that capability as
a first-class surface: an encoder client streams rANS-coded GOPs to a
decoder server, which reconstructs on-device and returns a checksum of the
decoded frames. The client verifies the checksum against its own
encoder-side reconstruction — encoder/decoder bit-exactness end to end over
the wire (the SURVEY §4 "decode(encode(x)) == quantized x" invariant, plus
transport).

Wire protocol (all messages length-prefixed with <I):
  client -> server : JSON hello {codec, level, gop, h, w, n_gops, seed}
  per GOP          : JSON info {mv_shape, z_shape, feat_shape, bits}
                     packed rANS streams blob
                     x0 raw float32 bytes (the I-frame; stands in for the
                     I-codec stream — see fvc.models.iframe / anchors.bpg)
  server -> client : JSON {sha, decode_ms} per GOP

Both sides build identical weights (same checkpoint, or the same seeded
fresh init), mirroring a deployed encoder/decoder pair.

Usage:
  python scripts/stream_demo.py --role loopback            # one process
  python scripts/stream_demo.py --role server --port 9555
  python scripts/stream_demo.py --role client --port 9555
"""

import argparse
import hashlib
import json
import socket
import struct
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def send_msg(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack("<I", len(payload)) + payload)


MAX_MSG = 256 << 20  # 256 MiB: far above any packed-GOP stream, far below 4GiB


def recv_msg(sock: socket.socket) -> bytes:
    hdr = _recv_exact(sock, 4)
    (n,) = struct.unpack("<I", hdr)
    if n > MAX_MSG:
        raise ConnectionError(f"message length {n} exceeds {MAX_MSG}")
    return _recv_exact(sock, n)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return bytes(buf)


def build_codec(hello: dict, ckpt: str | None, cpu: bool):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from fvc.models.bitstream import LSVCBitstreamCodec
    from fvc.models.registry import get_codec_model

    model, cfg = get_codec_model(hello["codec"],
                                 compression_level=hello["level"])
    probe = np.zeros((hello["gop"] + 1, hello["h"], hello["w"], 3), np.float32)
    variables = model.init(jax.random.PRNGKey(hello["seed"]),
                           jax.numpy.asarray(probe), training=False)
    if ckpt:
        from fvc.train.checkpoint import latest_checkpoint, restore_checkpoint
        path = latest_checkpoint(ckpt)
        if path is None:
            raise SystemExit(f"--ckpt {ckpt}: no checkpoint found")
        variables = restore_checkpoint(path, {"params": variables})["params"]
        print(f"# restored {path}", file=sys.stderr)
    return LSVCBitstreamCodec(model, variables)


def serve(sock: socket.socket, ckpt: str | None, cpu: bool) -> None:
    """Decoder side: one connection, n_gops rounds."""
    from fvc.models.bitstream import unpack_streams

    hello = json.loads(recv_msg(sock))
    for k, hi in (("h", 8192), ("w", 8192), ("gop", 256), ("n_gops", 10000),
                  ("level", 16), ("seed", 2**31)):
        v = hello.get(k)
        if not isinstance(v, int) or not 0 <= v <= hi:
            raise ConnectionError(f"hello field {k}={v!r} out of bounds")
    codec = build_codec(hello, ckpt, cpu)
    h, w = hello["h"], hello["w"]
    for gi in range(hello["n_gops"]):
        info = json.loads(recv_msg(sock))
        streams = unpack_streams(recv_msg(sock))
        x0 = np.frombuffer(recv_msg(sock), np.float32).reshape(h, w, 3)
        t0 = time.perf_counter()
        recon = codec.decompress(
            x0, streams,
            {k: tuple(v) for k, v in info.items() if k.endswith("_shape")})
        dt = time.perf_counter() - t0
        sha = hashlib.sha256(np.ascontiguousarray(recon).tobytes()).hexdigest()
        send_msg(sock, json.dumps(
            {"gop": gi, "sha": sha, "decode_ms": round(dt * 1e3, 1)}).encode())
    print(f"# server: decoded {hello['n_gops']} GOPs", file=sys.stderr)


def run_client(sock: socket.socket, args) -> bool:
    from fvc.data.datasets import SyntheticVideoDataset
    from fvc.models.bitstream import pack_streams

    hello = {"codec": args.codec, "level": args.level, "gop": args.gop,
             "h": args.height, "w": args.width, "n_gops": args.num_gops,
             "seed": args.seed}
    send_msg(sock, json.dumps(hello).encode())
    codec = build_codec(hello, args.ckpt, args.cpu)

    ds = SyntheticVideoDataset(num_videos=args.num_gops,
                               frames=args.gop + 1, height=args.height,
                               width=args.width)
    ok = True
    for gi in range(args.num_gops):
        x = ds[gi]
        t0 = time.perf_counter()
        streams, info = codec.compress(x)
        enc_ms = (time.perf_counter() - t0) * 1e3
        bits = codec.num_bits(streams)
        wire_info = {k: list(v) for k, v in info.items()
                     if k.endswith("_shape")}
        wire_info["bits"] = bits
        send_msg(sock, json.dumps(wire_info).encode())
        send_msg(sock, pack_streams(streams))
        send_msg(sock, np.ascontiguousarray(x[0], np.float32).tobytes())
        reply = json.loads(recv_msg(sock))
        local_sha = hashlib.sha256(
            np.ascontiguousarray(info["recon"]).tobytes()).hexdigest()
        match = reply["sha"] == local_sha
        ok = ok and match
        T, H, W = args.gop, args.height, args.width
        mse = float(np.mean(np.square(info["recon"] - x[1:])))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(json.dumps({
            "gop": gi, "bpp_act": bits / (T * H * W),
            "psnr": round(psnr, 2), "encode_ms": round(enc_ms, 1),
            "decode_ms": reply["decode_ms"],
            "wire_match": match}), flush=True)
    print(json.dumps({"lossless_transport": ok}), flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["server", "client", "loopback"],
                    default="loopback")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9555)
    ap.add_argument("--codec", default="LSVC")
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (both sides must use the same)")
    ap.add_argument("--gop", type=int, default=4)
    ap.add_argument("--num-gops", type=int, default=2)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.role == "server":
        srv = socket.create_server((args.host, args.port))
        print(f"# listening on {args.host}:{args.port}", file=sys.stderr)
        conn, _ = srv.accept()
        with conn:
            serve(conn, args.ckpt, args.cpu)
    elif args.role == "client":
        with socket.create_connection((args.host, args.port)) as sock:
            ok = run_client(sock, args)
        sys.exit(0 if ok else 1)
    else:  # loopback: server thread + client in one process
        srv = socket.create_server((args.host, 0))
        port = srv.getsockname()[1]

        def _srv():
            conn, _ = srv.accept()
            with conn:
                serve(conn, args.ckpt, args.cpu)

        th = threading.Thread(target=_srv, daemon=True)
        th.start()
        with socket.create_connection((args.host, port)) as sock:
            ok = run_client(sock, args)
        th.join(timeout=30)
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""Loopback run of scripts/stream_demo.py: real rANS bitstreams over a TCP
socket, decoder-side reconstruction bit-identical to the encoder's."""

import json
import os
import subprocess
import sys


def test_stream_demo_loopback_bit_exact():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "stream_demo.py"),
         "--role", "loopback", "--cpu", "--gop", "2", "--num-gops", "1",
         "--height", "64", "--width", "64"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    lines = [json.loads(l) for l in out.stdout.splitlines()
             if l.startswith("{")]
    assert lines[-1] == {"lossless_transport": True}, lines
    gop_rows = [l for l in lines if "wire_match" in l]
    assert gop_rows and all(r["wire_match"] for r in gop_rows)
    assert all(r["bpp_act"] > 0 for r in gop_rows)

#!/bin/bash
# Round-5 perf window: runs INSIDE a logs/round5_pause window (the builder
# only touches the chip while the trainer idles — ROUND4_NOTES incident rule).
#
# Measures the round-5 occupancy work (VERDICT r04 #4/#8):
#   1. fused WarpNet ResBlock on real Mosaic (compile + exactness + timing)
#   2. per-stage SoL with FVC_PALLAS_WARPNET=0/1 at 640x960x6 (E-MC delta)
#   3. bench --fast at the gop-14 wavefront default, with and without the
#      fused E-MC path
# Artifacts land in docs/PERF_r05.log.
set -u
cd /root/repo
L=docs/PERF_r05.log
echo "=== perf window $(date +%H:%M:%S) ===" >> "$L"

run() { echo "--- $(date +%H:%M:%S) $*" >> "$L"; timeout 1200 "$@" >> "$L" 2>&1; }

# 1. on-chip exactness + micro-timing of the fused ResBlock
run python - <<'PY'
import time, numpy as np, jax, jax.numpy as jnp, flax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from fvc.ops.blocks import ResBlock
from fvc.ops.pallas_warpnet import fused_resblock

rng = np.random.RandomState(0)
B, H, W, C = 6, 640, 960, 64
x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
m = ResBlock(C)
v = flax.core.unfreeze(m.init(jax.random.PRNGKey(1), x[:1, :64, :64]))
p = jax.tree_util.tree_map(
    lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.1),
    v["params"])
ref_fn = jax.jit(lambda x: m.apply({"params": p}, x))
try:
    fus_fn = jax.jit(lambda x: fused_resblock(x, p, block_rows=32))
    out = jax.block_until_ready(fus_fn(x))
    ref = jax.block_until_ready(ref_fn(x))
    err = float(jnp.abs(out - ref).max())
    print("fused_resblock COMPILES on Mosaic; max|err| vs XLA:", err)
    def t(f):
        ts = []
        for _ in range(6):
            t0 = time.perf_counter(); jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    # K-chained to amortize dispatch
    def chain(f):
        def g(x):
            def body(_, c):
                return f(c)
            return jax.lax.fori_loop(0, 8, body, x)
        return jax.jit(g)
    cx, cf = chain(lambda y: ref_fn(y)), chain(lambda y: fused_resblock(y, p, block_rows=32))
    jax.block_until_ready(cx(x)); jax.block_until_ready(cf(x))
    print(f"XLA resblock  x8: {t(cx)*125:.2f} ms/call")
    print(f"fused resblock x8: {t(cf)*125:.2f} ms/call")
    # bf16 operands variant
    cfb = chain(lambda y: fused_resblock(y, p, block_rows=32,
                                         compute_dtype=jnp.bfloat16))
    jax.block_until_ready(cfb(x))
    print(f"fused bf16    x8: {t(cfb)*125:.2f} ms/call")
except Exception as e:
    print("fused_resblock FAILED on Mosaic:", str(e)[:400])
PY

# 2. per-stage SoL with and without the fused E-MC
run python scripts/profile_stages.py --gop 6 --height 640 --width 960
FVC_PALLAS_WARPNET=1 run env FVC_PALLAS_WARPNET=1 \
    python scripts/profile_stages.py --gop 6 --height 640 --width 960

# 3. headline bench at the gop-14 default (fast), both paths
run python bench.py --fast --iters 4
run env FVC_PALLAS_WARPNET=1 python bench.py --fast --iters 4

# 4. family bench: ELFVC with the s2d(2)-packed FlowPredictor (now default)
#    + SSF — VERDICT r04 #8 deltas vs docs/PERF_r04.log
run python scripts/bench_family.py --iters 6

echo "=== perf window done $(date +%H:%M:%S) ===" >> "$L"

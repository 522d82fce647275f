#!/usr/bin/env python
"""Find the composition overhead in the hybrid sweep at EchoNest scale.

step_decomp_probe: full step 469 ms, tail alone 221, head alone 37,
step-minus-sweep 15 — 196 ms appears only when composed. Candidates:
the exp()+expansion glue in sweep_hybrid, or scheduling loss when the
head pallas_call and the two tail scans share one program.

RESOLVED (r4, 26.9M-nnz run, v5e): there is no composition overhead.
Stages 1/2 measured 154.4 vs 150.5 ms (glue ~4 ms), and stage 3's
isolated halves measured 113.3 + 114.3 ms — the "196 ms" was the
item-side half-sweep, dead-code-eliminated in step_decomp_probe's
original tail stage (it returned only acc_a). NOTE stages 1 and 2
both still DCE the item half (they return acc_a only) — they isolate
the GLUE delta, not the absolute sweep cost; stage 3 is the honest
per-half cost. See step_decomp_probe.py for the closed accounting.

Times, on the same data/state:
  1. jit(sweep_hybrid)                      (sweep + glue, no updates)
  2. jit(tail-sweep + head-kernel)          (both raw, one program)
  3. jit(tail half user) + jit(tail half item)  (separate programs)

Usage: python scripts/hybrid_glue_probe.py [nnz_millions]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

N, M, K = 1019318, 384546, 100
T_HEAD = 4096


def fence(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(label, fn, *args, iters=3):
    r = fn(*args)
    fence(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    fence(r)
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {dt * 1e3:9.1f} ms", flush=True)
    return r


def main():
    nnz_m = float(sys.argv[1]) if len(sys.argv) > 1 else 85.0
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from bigsparse_scale_check import build_coo
    u, i, y = build_coo(N, M, int(nnz_m * 1e6))
    print(f"nnz={u.size / 1e6:.1f}M", flush=True)

    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.data.device import build_device_data
    from hgaprec_tpu.data.ratings import RatingsStore
    from hgaprec_tpu.models.state import init_state
    from hgaprec_tpu.ops.sweep import sweep_hybrid
    from hgaprec_tpu.ops.mxu_tail import mxu_tail_sweep
    from hgaprec_tpu.ops.dense_pallas import fused_dense_sweep

    store = RatingsStore(N, M)
    store.user2seq = {int(x): int(x) for x in range(N)}
    store.movie2seq = {int(x): int(x) for x in range(M)}
    store.seq2user = {}
    store.seq2movie = {}
    store._u = u
    store._i = i
    store._y = np.minimum(y.astype(np.int64), 255)
    store.finalize()
    data = build_device_data(store, hybrid_head_items=T_HEAD,
                             dense_limit_bytes=0)
    print("data built", flush=True)

    cfg = ModelConfig(n=N, m=M, k=K, variant="hpf", sweep="hybrid",
                      matmul_precision="default")
    state = init_state(cfg, seed=1)
    a_lin = jnp.exp(state.theta.elog)
    b_lin = jnp.exp(state.beta.elog)

    # 1. the whole sweep incl glue
    f1 = jax.jit(lambda ea, eb, d: sweep_hybrid(ea, eb, None, None, d,
                                                bf16=True).acc_a)
    timed("sweep_hybrid (sweep + glue)", f1,
          state.theta.elog, state.beta.elog, data)

    # 2. raw tail + head in ONE program
    def both(a, b, t, hi, hy):
        ta = mxu_tail_sweep(a, b, None, None, t, bf16=True)[0]
        ha = fused_dense_sweep(a, b[hi], hy, bf16=True)[0]
        return ta + a * ha

    f2 = jax.jit(both)
    timed("tail + head, one program", f2, a_lin, b_lin,
          data.tail_compact, data.head_items, data.head_dense_y)

    # 3. halves in separate programs (isolated-cost baseline)
    from hgaprec_tpu.ops.mxu_tail import _augment, _half_sweep
    tc = data.tail_compact
    kp = 128
    a_t = _augment(a_lin[tc.users], None, None, kp).astype(jnp.bfloat16)
    b_t = _augment(b_lin[tc.items], None, None, kp).astype(jnp.bfloat16)
    fu = jax.jit(lambda p, o, pc, oc, yy: _half_sweep(
        p, o, pc, oc, yy, chunk=1024, batch=64,
        mm_dtype=jnp.bfloat16, prec=None))
    timed("tail half user-side alone", fu, a_t, b_t, tc.cu, tc.ci, tc.y)
    timed("tail half item-side alone", fu, b_t, a_t, tc.ci_i, tc.cu_i,
          tc.y_i)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Decompose the hybrid HPF cavi_step cost at EchoNest-preset scale.

RESOLVED (r4, 26.9M-nnz run, v5e): the "~200 ms unattributed" gap this
probe was written for was the DCE trap — the original "tail alone"
stage returned only acc_a, so XLA dead-code-eliminated the entire
item-side half-sweep. With both accumulators reduced (fixed below),
the books balance:

  full hybrid cavi_step            282.5 ms
  tail user half alone             113.3 ms   (hybrid_glue_probe)
  tail item half alone             114.3 ms
  fused dense head alone            41.2 ms
  rate updates + expectations       13.8 ms
  sweep_hybrid exp()+combine glue   ~4 ms     (154.4 vs 150.5,
                                               hybrid_glue_probe)

i.e. the tail two-pass sweep is ~80% of the step (~25 ns/nnz PER
HALF, ~50 both), head+updates+glue the rest. This probe now times:

  1. the full hybrid cavi_step         (the artifact's number)
  2. mxu_tail_sweep alone (BOTH accumulators reduced)
  3. fused dense head alone
  4. a cavi_step whose sweep result is precomputed constants
     (rate updates + expectations + state rebuild alone)

Usage: python scripts/step_decomp_probe.py [nnz_millions]
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
    print(f"{label:40s} {dt * 1e3:9.1f} ms", flush=True)
    return r


def main():
    nnz_m = float(sys.argv[1]) if len(sys.argv) > 1 else 85.0
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from bigsparse_scale_check import build_coo
    u, i, y = build_coo(N, M, int(nnz_m * 1e6))
    nnz = u.size
    print(f"nnz={nnz / 1e6:.1f}M", flush=True)

    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.data.device import build_device_data
    from hgaprec_tpu.data.ratings import RatingsStore
    from hgaprec_tpu.models.state import init_state
    from hgaprec_tpu.models.step import cavi_step
    import functools

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
    print(f"head built: T={data.head_items.shape[0]} "
          f"tail={data.u_ids_tail.shape[0] / 1e6:.1f}M", flush=True)

    cfg = ModelConfig(n=N, m=M, k=K, variant="hpf", sweep="hybrid",
                      matmul_precision="default")
    state = init_state(cfg, seed=1)

    # 1. full step
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(st, d, cfg=cfg):
        return cavi_step(st, d, cfg, None, None)

    timed("full hybrid cavi_step", step, state, data)

    a_lin = jnp.exp(state.theta.elog)
    b_lin = jnp.exp(state.beta.elog)

    # 2. tail alone (tc passed as an argument — NEVER close over device
    # arrays: a captured multi-GB buffer becomes a jaxpr constant and
    # stalls compilation at tens of GB of host RSS)
    from hgaprec_tpu.ops.mxu_tail import mxu_tail_sweep

    def _tail_both(a, b, t):
        # reduce BOTH accumulators: returning only acc_a lets XLA
        # dead-code-eliminate the whole item-side half (the bug that
        # made this probe report ~200 ms "unattributed" in r4)
        ra, rb, _, _ = mxu_tail_sweep(a, b, None, None, t, bf16=True)
        return jnp.sum(ra) + jnp.sum(rb)

    f_tail = jax.jit(_tail_both)
    timed("mxu_tail_sweep alone", f_tail, a_lin, b_lin, data.tail_compact)

    # 3. head alone
    from hgaprec_tpu.ops.dense_pallas import fused_dense_sweep
    f_head = jax.jit(lambda a, bh, y: fused_dense_sweep(
        a, bh, y, bf16=True)[0])
    timed("fused dense head alone", f_head, a_lin,
          b_lin[data.head_items], data.head_dense_y)

    # 4. rate updates + expectations alone (sweep result = constants)
    import hgaprec_tpu.ops.sweep as sweep_mod
    const_res = sweep_mod.SweepResult(
        jnp.ones((N, K), jnp.float32), jnp.ones((M, K), jnp.float32),
        None, None)

    real_sweep = sweep_mod.sweep

    def fake_sweep(*a, **kw):
        return const_res

    sweep_mod.sweep = fake_sweep
    import importlib
    import hgaprec_tpu.models.step as step_mod
    importlib.reload(step_mod)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step_nosweep(st, d, cfg=cfg):
        return step_mod.cavi_step(st, d, cfg, None, None)

    try:
        timed("cavi_step minus sweep (const res)", step_nosweep,
              state, data)
    finally:
        sweep_mod.sweep = real_sweep
        importlib.reload(step_mod)


if __name__ == "__main__":
    main()

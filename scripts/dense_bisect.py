#!/usr/bin/env python
"""Bisect the 64 ms vs 2700 ms fused-dense discrepancy at Netflix shape.

netflix_scale_check times the HPF cavi_step (donated state, row_mask,
generative y) at 64 ms/iter; head_probe times a direct fused_dense_sweep
call (uniform y, fresh buffers) at 2700 ms. Same kernel, same shape.
This script holds the y matrix FIXED (uniform 1%) and varies one factor
at a time:

  A. direct fused_dense_sweep, non-donated inputs   (head_probe style)
  B. direct fused_dense_sweep, donated a/b
  C. cavi_step wrapper, donated state               (netflix style)
  D. direct call, inputs produced inside the jit from donated state

Usage: python scripts/dense_bisect.py [n m]
"""

import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

K = 100


def scalar_fence(x):
    # pull ONE scalar through a device slice (not a full-array transfer)
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timed(label, fn, iters=3):
    r = fn()
    scalar_fence(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    scalar_fence(r)
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {dt * 1e3:9.1f} ms", flush=True)
    return r


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 480189
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 17770
    from hgaprec_tpu.ops.dense_pallas import fused_dense_sweep
    rng = np.random.default_rng(0)
    npad = -(-n // 4096) * 4096
    mpad = -(-m // 4096) * 4096

    @jax.jit
    def gen(key):
        r = jax.random.uniform(key, (npad, mpad))
        return (r < 0.01).astype(jnp.uint8)

    y = gen(jax.random.PRNGKey(1))
    jax.block_until_ready(y)
    a = jnp.asarray(rng.random((npad, K), np.float32) + 0.1)
    b = jnp.asarray(rng.random((m, K), np.float32) + 0.1)

    # --- A: head_probe style ---
    fa = jax.jit(lambda a_, b_, y_: fused_dense_sweep(a_, b_, y_,
                                                      bf16=True)[0])
    timed("A direct, non-donated", lambda: fa(a, b, y))

    # --- B: donated factor buffers (fresh copies each call) ---
    fb = jax.jit(lambda a_, b_, y_: fused_dense_sweep(a_, b_, y_,
                                                      bf16=True)[0],
                 donate_argnums=(0, 1))

    def run_b():
        return fb(a + 0.0, b + 0.0, y)

    timed("B direct, donated a/b", run_b)

    # --- C: cavi_step wrapper (netflix_scale_check style) ---
    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.data.device import DeviceData
    from hgaprec_tpu.models.state import init_state
    from hgaprec_tpu.models.step import cavi_step
    dummy = jnp.zeros(8, jnp.int32)
    data = DeviceData(u_ids=dummy, i_ids=dummy,
                      y=jnp.zeros(8, jnp.float32), item_order=dummy,
                      i_ids_sorted=dummy, u_ids_by_item=dummy, dense_y=y)
    row_mask = (jnp.arange(npad) < n).astype(jnp.float32)
    cfg = ModelConfig(n=npad, m=m, k=K, variant="hpf", sweep="dense",
                      matmul_precision="default", item_block=4096)
    state = init_state(cfg, seed=1)

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("cfg",))
    def step(st, d, rm, cfg=cfg):
        return cavi_step(st, d, cfg, None, rm)

    state = step(state, data, row_mask, cfg=cfg)
    scalar_fence(state.theta.e)
    t0 = time.time()
    for _ in range(3):
        state = step(state, data, row_mask, cfg=cfg)
    scalar_fence(state.theta.e)
    print(f"{'C cavi_step wrapper, donated state':44s} "
          f"{(time.time() - t0) / 3 * 1e3:9.1f} ms", flush=True)

    # --- D: direct kernel on values derived in-jit from donated state ---
    st2 = init_state(cfg, seed=2)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def stepd(st, y_):
        a_lin = jnp.exp(st.theta.elog)
        b_lin = jnp.exp(st.beta.elog)
        acc = fused_dense_sweep(a_lin, b_lin, y_, bf16=True)[0]
        import dataclasses
        th = dataclasses.replace(st.theta, e=acc)
        return dataclasses.replace(st, theta=th)

    st2 = stepd(st2, y)
    scalar_fence(st2.theta.e)
    t0 = time.time()
    for _ in range(3):
        st2 = stepd(st2, y)
    scalar_fence(st2.theta.e)
    print(f"{'D in-jit derived inputs, donated state':44s} "
          f"{(time.time() - t0) / 3 * 1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()

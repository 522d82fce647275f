#!/usr/bin/env python
"""Netflix-preset scale check: one-chip HPF K=100 at 480189 x 17770.

Everything stays on device: the synthetic count matrix is sampled with
jax.random directly into a uint8 [N, M] HBM buffer (Bernoulli-Poisson
sparsity + truncated-Poisson counts), then the jitted HPF CAVI step is
timed at f32-HIGHEST and bf16 matmul precision. The sandbox host's
lazily-provisioned memory makes host-side generation of ~10 GB
impractical (~300us per first-touch page fault), and a production
deployment would stream from storage anyway.

Writes .bench_cache/netflix_scale.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

N, M, K = 480189, 17770, 100
SCALE = 0.12
CHUNK = 4096
ITEM_BLOCK = 4096
# columns baked padded to the item block so the sweep slices in place —
# an in-jit pad would copy the ~10 GB uint8 matrix every step
M_PAD = -(-M // ITEM_BLOCK) * ITEM_BLOCK


def build_dense_on_device(seed: int = 7):
    """u8[N_pad, M] counts sampled from the HPF generative model on-chip.

    One jitted lax.scan over user chunks — a single device dispatch with
    no per-chunk host syncs (the chunked-dispatch version spent ~8.5 s of
    tunnel latency per chunk)."""
    n_pad = -(-N // CHUNK) * CHUNK
    nchunks = n_pad // CHUNK
    key = jax.random.PRNGKey(seed)
    kb, ke, kloop = jax.random.split(key, 3)

    @jax.jit
    def gen(kb, ke, kloop):
        eta = jax.random.gamma(ke, 1.8, (M,)) / 0.3
        beta = jax.random.gamma(kb, 0.3, (M, 8)) / eta[:, None]
        # padding columns get zero rate -> zero counts
        beta = jnp.pad(beta, ((0, M_PAD - M), (0, 0)))

        def body(carry, c):
            dense, nnz, k = carry
            k, kx, kt, ku, kp = jax.random.split(k, 5)
            xi = jax.random.gamma(kx, 1.8, (CHUNK,)) / 0.3
            theta = jax.random.gamma(kt, 0.3, (CHUNK, 8)) / xi[:, None]
            rate = SCALE * jnp.dot(theta, beta.T,
                                   preferred_element_type=jnp.float32)
            p = -jnp.expm1(-rate)
            mask = jax.random.uniform(ku, rate.shape) < p
            extra = jax.random.poisson(kp, rate)
            y = jnp.where(mask, 1 + extra, 0)
            rows = c * CHUNK + jnp.arange(CHUNK)[:, None]
            y = jnp.where(rows < N, y, 0)    # rows past N zeroed
            blk = jnp.minimum(y, 255).astype(jnp.uint8)
            dense = jax.lax.dynamic_update_slice(dense, blk, (c * CHUNK, 0))
            return (dense, nnz + jnp.sum(blk > 0, dtype=jnp.int64), k), None

        init = (jnp.zeros((n_pad, M_PAD), jnp.uint8),
                jnp.zeros((), jnp.int64), kloop)
        (dense, nnz, _), _ = jax.lax.scan(
            body, init, jnp.arange(nchunks, dtype=jnp.int32))
        return dense, nnz

    dense, nnz = gen(kb, ke, kloop)
    return dense, int(nnz)


def main():
    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.data.device import DeviceData
    from hgaprec_tpu.models.state import init_state
    from hgaprec_tpu.models.step import make_step

    t0 = time.time()
    dense, nnz = build_dense_on_device()
    jax.block_until_ready(dense)
    print(f"on-device gen {time.time() - t0:.0f}s nnz={nnz / 1e6:.1f}M",
          flush=True)

    dummy = jnp.zeros(8, jnp.int32)
    data = DeviceData(u_ids=dummy, i_ids=dummy,
                      y=jnp.zeros(8, jnp.float32), item_order=dummy,
                      i_ids_sorted=dummy, u_ids_by_item=dummy,
                      dense_y=dense)

    n_pad = dense.shape[0]
    row_mask = (jnp.arange(n_pad) < N).astype(jnp.float32)
    results = {"n": N, "m": M, "k": K, "nnz": int(nnz)}
    import functools
    from hgaprec_tpu.models.step import cavi_step
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for prec, bias, tag in (("default", False, "bf16"),
                            ("highest", False, "f32"),
                            ("default", True, "bf16_bias"),
                            ("highest", True, "f32_bias")):
        if only and tag not in only:
            continue
        cfg = ModelConfig(n=n_pad, m=M, k=K, variant="hpf", sweep="dense",
                          bias=bias, matmul_precision=prec,
                          item_block=ITEM_BLOCK)
        state = init_state(cfg, seed=1)

        # NB: data/row_mask must be real arguments — a closed-over 10 GB
        # jax.Array becomes a jaxpr *constant* and stalls compilation.
        # Timing uses the PRODUCTION dispatch shape: rfreq iterations
        # fused into one device program (models/engine.py::_run_loop) —
        # per-dispatch timing on the tunneled chip carries a 10-40 ms
        # host-dispatch overhead that the engine never pays (measured
        # r5, scripts/dense_mfu_probe.py follow-up: the fused kernel
        # runs ~1.5 us/tile vs ~3.6 per-dispatch at 65k rows)
        from hgaprec_tpu.models.step import cavi_multi_step
        chunk = 10

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("cfg",))
        def steps(st, d, rm, cfg=cfg):
            return cavi_multi_step(st, d, cfg, jnp.int32(chunk), None, rm)
        # fences are host materializations of a value depending on every
        # prior step — block_until_ready can return early on the tunnel
        t0 = time.time()
        state = steps(state, data, row_mask, cfg=cfg)
        _ = np.asarray(state.theta.e[0, 0])
        print(f"{tag} compile+first {time.time() - t0:.1f}s", flush=True)
        state = steps(state, data, row_mask, cfg=cfg)
        _ = np.asarray(state.theta.e[0, 0])
        t0 = time.time()
        disp = 3
        for _ in range(disp):
            state = steps(state, data, row_mask, cfg=cfg)
        _ = np.asarray(state.theta.e[0, 0])
        ms = (time.time() - t0) / (disp * chunk) * 1e3
        print(f"{tag}: {ms:.1f} ms/iter ({chunk} iters/dispatch)",
              flush=True)
        results[f"ms_per_iter_{tag}"] = round(ms, 1)
        results["iters_per_dispatch"] = chunk
        # sanity: finite state
        assert np.isfinite(float(jnp.sum(state.theta.e)))
    out = os.path.join(ROOT, ".bench_cache", "netflix_scale.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Netflix-preset scale check: one-chip HPF K=100 at 480189 x 17770.

Generates ~100M synthetic counts (Bernoulli-Poisson sparsity mask, then
truncated-Poisson counts on the nonzeros), builds the uint8 dense store,
and times the jitted HPF CAVI step at f32-HIGHEST and bf16 matmul
precision. Writes results to .bench_cache/netflix_scale.json.
"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

N, M, K = 480189, 17770, 100
SCALE = 0.12

def gen(rng):
    from numpy import float32
    eta = rng.gamma(1.8, 1 / 0.3, size=M)
    beta = rng.gamma(0.3, 1.0 / eta[:, None], size=(M, 8)).astype(float32)
    us, is_, ys = [], [], []
    t0 = time.time()
    for lo in range(0, N, 20000):
        hi = min(lo + 20000, N)
        xi = rng.gamma(1.8, 1 / 0.3, size=hi - lo)
        theta = rng.gamma(0.3, 1.0 / xi[:, None], size=(hi - lo, 8)).astype(float32)
        rate = SCALE * (theta @ beta.T)
        p = -np.expm1(-rate)
        mask = rng.random(rate.shape, dtype=np.float32) < p
        uu, ii = np.nonzero(mask)
        yy = 1 + rng.poisson(rate[uu, ii].astype(np.float64))
        us.append((uu + lo).astype(np.int32)); is_.append(ii.astype(np.int32))
        ys.append(np.minimum(yy, 255).astype(np.int32))
        if lo % 100000 == 0:
            print(f"gen {lo}/{N} ({time.time()-t0:.0f}s)", flush=True)
    return np.concatenate(us), np.concatenate(is_), np.concatenate(ys)

def main():
    rng = np.random.default_rng(7)
    t0 = time.time()
    u, i, y = gen(rng)
    print(f"gen done {time.time()-t0:.0f}s nnz={u.size/1e6:.1f}M", flush=True)

    from hgaprec_tpu.data.ratings import RatingsStore
    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.data.device import build_device_data
    from hgaprec_tpu.models.state import init_state
    from hgaprec_tpu.models.step import make_step

    t0 = time.time()
    store = RatingsStore(N, M)
    store.user2seq = {x: x for x in range(N)}; store.seq2user = dict(store.user2seq)
    store.movie2seq = {x: x for x in range(M)}; store.seq2movie = dict(store.movie2seq)
    store._u, store._i, store._y = u, i, y
    store.finalize()
    print(f"store {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    data = build_device_data(store, pad_multiple=4096)
    jax.block_until_ready(data.dense_y)
    print(f"device data {time.time()-t0:.0f}s dense={data.dense_y.shape}", flush=True)

    results = {"n": N, "m": M, "k": K, "nnz": int(u.size)}
    for prec, tag in (("default", "bf16"), ("highest", "f32")):
        cfg = ModelConfig(n=store.n, m=store.m, k=K, variant="hpf",
                          sweep="dense", matmul_precision=prec,
                          item_block=4096)
        state = init_state(cfg, seed=1)
        step = make_step(cfg)
        t0 = time.time(); state = step(state, data); jax.block_until_ready(state)
        print(f"{tag} compile+first {time.time()-t0:.1f}s", flush=True)
        state = step(state, data); jax.block_until_ready(state)
        t0 = time.time()
        for _ in range(5): state = step(state, data)
        jax.block_until_ready(state)
        ms = (time.time() - t0) / 5 * 1e3
        print(f"{tag}: {ms:.0f} ms/iter", flush=True)
        results[f"ms_per_iter_{tag}"] = round(ms, 1)
    out = os.path.join(ROOT, ".bench_cache", "netflix_scale.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(results, open(out, "w"), indent=1)
    print(json.dumps(results), flush=True)

if __name__ == "__main__":
    main()

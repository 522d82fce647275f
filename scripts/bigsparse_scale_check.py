#!/usr/bin/env python
"""Segment-path scale check: EchoNest / NYT-preset shapes on one chip.

The dense uint8 stream is impossible at these shapes (EchoNest
1019318 x 384546 ~ 392 GB dense), so training runs the chunked segment
sweep (ops/sweep.py::sweep_segment_chunked): the [P, K] phi tensor only
ever exists [chunk, K] at a time. This harness builds a synthetic COO
stream at preset scale on the host, times the HPF CAVI step, and writes
.bench_cache/<preset>_scale.json.

Usage: python scripts/bigsparse_scale_check.py [echonest|nyt] [nnz_millions]
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

# run.pl presets (scripts/run.pl:84-87, 158-161)
PRESETS = {
    "echonest": (1019318, 384546),
    "nyt": (1615675, 107523),
}
K = 100


def build_coo(n, m, nnz, seed=5):
    """Power-law synthetic COO stream, user-sorted, deduplicated.

    Item popularity is zipf(1.2) — the marginal family the reference's
    own analysis fits to plays/clicks (marg.R NB fits; EchoNest/NYT are
    heavily head-concentrated). User activity keeps the milder power
    marginal."""
    rng = np.random.default_rng(seed)
    u = (n * rng.power(3.0, nnz)).astype(np.int64)
    i = np.minimum(rng.zipf(1.2, nnz) - 1, m - 1).astype(np.int64)
    u = np.minimum(u, n - 1)
    key = u * m + i
    order = np.argsort(key, kind="stable")
    key = key[order]
    keep = np.concatenate([[True], key[1:] != key[:-1]])
    u, i = u[order][keep], i[order][keep]
    y = rng.integers(1, 5, u.size).astype(np.float32)
    return u.astype(np.int32), i.astype(np.int32), y


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "echonest"
    nnz_m = float(sys.argv[2]) if len(sys.argv) > 2 else 48.0
    n, m = PRESETS[preset]

    t0 = time.time()
    u, i, y = build_coo(n, m, int(nnz_m * 1e6))
    print(f"host gen {time.time() - t0:.0f}s nnz={u.size / 1e6:.1f}M",
          flush=True)

    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.data.device import DeviceData
    from hgaprec_tpu.models.state import init_state
    from hgaprec_tpu.models.step import cavi_step

    t0 = time.time()
    item_order = np.argsort(i, kind="stable").astype(np.int32)
    j = lambda x: jax.device_put(x)
    data = DeviceData(u_ids=j(u), i_ids=j(i), y=j(y),
                      item_order=j(item_order),
                      i_ids_sorted=j(i[item_order]),
                      u_ids_by_item=j(u[item_order]), dense_y=None)
    print(f"device data {time.time() - t0:.0f}s", flush=True)

    # hybrid head/tail layout: top-degree items as a dense uint8 block,
    # built ON DEVICE (a multi-GB host alloc would page-fault for
    # minutes in this sandbox; production hosts build it host-side in
    # build_device_data)
    import dataclasses
    t_head = 8192
    deg = np.bincount(i, minlength=m)
    head_ids = np.sort(np.argsort(-deg, kind="stable")[:t_head])
    head_ids = head_ids.astype(np.int32)
    col_of = np.full(m, -1, np.int32)
    col_of[head_ids] = np.arange(t_head, dtype=np.int32)
    in_head = col_of[i] >= 0
    coverage = float(in_head.mean())
    npad = -(-n // 512) * 512

    @jax.jit
    def build_head(uh, ch, yh):
        z = jnp.zeros((npad, t_head), jnp.uint8)
        return z.at[uh, ch].set(jnp.minimum(yh, 255).astype(jnp.uint8))

    head_dense = build_head(jnp.asarray(u[in_head]),
                            jnp.asarray(col_of[i[in_head]]),
                            jnp.asarray(y[in_head]))
    ut, it_, yt = u[~in_head], i[~in_head], y[~in_head]
    pt = -(-max(ut.size, 1) // 1024) * 1024
    padt = pt - ut.size
    data_h = dataclasses.replace(
        data,
        head_items=j(head_ids), head_dense_y=head_dense,
        u_ids_tail=j(np.concatenate([ut, np.full(padt, n - 1, np.int32)])),
        i_ids_tail=j(np.concatenate([it_, np.full(padt, m - 1,
                                                  np.int32)])),
        y_tail=j(np.concatenate([yt, np.zeros(padt, np.float32)])))
    print(f"head: T={t_head} coverage={coverage:.2f} "
          f"tail nnz={ut.size / 1e6:.1f}M", flush=True)

    results = {"preset": preset, "n": n, "m": m, "k": K, "nnz": int(u.size),
               "head_T": t_head, "head_coverage": round(coverage, 3)}
    import functools
    for mode, prec, tag in (("segment-chunked", "default", "bf16"),
                            ("hybrid", "default", "hybrid_bf16"),
                            ("hybrid", "highest", "hybrid_f32")):
        cfg = ModelConfig(n=n, m=m, k=K, variant="hpf",
                          sweep=mode, matmul_precision=prec)
        dd = data_h if mode == "hybrid" else data
        state = init_state(cfg, seed=1)

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("cfg",))
        def step(st, d, cfg=cfg):
            return cavi_step(st, d, cfg, None, None)

        t0 = time.time()
        state = step(state, dd, cfg=cfg)
        _ = np.asarray(state.theta.e[0, 0])
        print(f"{tag} compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            state = step(state, dd, cfg=cfg)
        _ = np.asarray(state.theta.e[0, 0])
        ms = (time.time() - t0) / iters * 1e3
        print(f"{tag}: {ms:.0f} ms/iter", flush=True)
        results[f"ms_per_iter_{tag}"] = round(ms, 1)
        assert np.isfinite(float(np.asarray(state.theta.e).sum()))

    # streamed ranking-eval timing (VERDICT r1 #5): rank 1000 heldout
    # (user, item) pairs among all M items with the device rank counter
    # — the [S, M] host matrix never exists at these shapes
    from hgaprec_tpu.eval.score import scorer_from_state
    from hgaprec_tpu.eval.topk import item_ranks

    row_ptr = np.concatenate(
        [[0], np.cumsum(np.bincount(u, minlength=n))]).astype(np.int64)

    class _StoreShim:
        def __init__(self):
            self.m = m
            self.n = n

        def items_of_user(self, nn):
            s, e = row_ptr[nn], row_ptr[nn + 1]
            return i[s:e].astype(np.int64)

    class _IndexShim:
        @staticmethod
        def val_items(nn):
            return np.zeros(0, np.int64)

    rng = np.random.default_rng(3)
    pairs_u = rng.integers(0, n, 1000)
    pairs_i = rng.integers(0, m, 1000)
    sc = scorer_from_state(state, cfg)
    t0 = time.time()
    ranks, _ = item_ranks(sc, _StoreShim(), _IndexShim(), pairs_u, pairs_i)
    dt = time.time() - t0
    print(f"itemrank eval (1000 pairs x {m} items): {dt:.1f}s", flush=True)
    results["itemrank_1000pairs_s"] = round(dt, 2)
    assert int(ranks.min()) >= 0 and int(ranks.max()) < m

    out = os.path.join(ROOT, ".bench_cache", f"{preset}_scale.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(results, open(out, "w"), indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

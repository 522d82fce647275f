#!/usr/bin/env python
"""Big-sparse scale check: EchoNest / NYT-preset shapes on one chip.

The dense uint8 stream is impossible at these shapes (EchoNest
1019318 x 384546 ~ 392 GB dense), so training runs either the chunked
segment sweep or the hybrid head/tail layout (dense top-degree items on
the MXU + the sparse tail). This harness builds a synthetic COO stream
at preset scale on the host, times the HPF CAVI step per mode, and
writes .bench_cache/<preset>_scale.json.

Memory staging matters on a 16 GB chip: the segment mode runs first on
the raw COO, which is then FREED before the multi-GB head block is
built (keeping both alive OOMs at EchoNest scale — learned on hardware).

Usage: python scripts/bigsparse_scale_check.py [echonest|nyt]
           [nnz_millions] [head_gib]
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
    marginal. NB: zipf dedup removes ~40% of draws at EchoNest scale,
    so request ~1.7x the target nnz."""
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


def fence(x):
    # device-side slice FIRST, then a 4-byte host transfer. np.asarray
    # on the full array pulls it over the axon tunnel at ~80 MB/s — a
    # 400 MB accumulator adds ~5 s to the timing block, which is what
    # poisoned every r3 big-sparse measurement (scripts/dense_bisect.py)
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def time_mode(cfg, data, label, dispatches=2, chunk=5):
    """Time the PRODUCTION dispatch shape: `chunk` iterations fused in
    one device program (models/engine.py fuses rfreq iterations per
    dispatch). Per-dispatch single-step timing on the tunneled chip
    carries a 10-40 ms host-dispatch overhead the engine never pays
    (r5 finding, scripts/dense_mfu_probe.py follow-up)."""
    import functools
    from hgaprec_tpu.models.state import init_state
    from hgaprec_tpu.models.step import cavi_multi_step

    state = init_state(cfg, seed=1)

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("cfg",))
    def steps(st, d, cfg=cfg):
        return cavi_multi_step(st, d, cfg, chunk, None, None)

    t0 = time.time()
    state = steps(state, data, cfg=cfg)
    _ = fence(state.theta.e)
    print(f"{label} compile+first {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(dispatches):
        state = steps(state, data, cfg=cfg)
    _ = fence(state.theta.e)
    ms = (time.time() - t0) / (dispatches * chunk) * 1e3
    print(f"{label}: {ms:.0f} ms/iter ({chunk} iters/dispatch)",
          flush=True)
    assert np.isfinite(float(np.asarray(state.theta.e).sum()))
    return ms, state


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "echonest"
    nnz_m = float(sys.argv[2]) if len(sys.argv) > 2 else 85.0
    head_gib = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    # "skipseg": carry the previous artifact's segment numbers forward
    # instead of re-paying the 45M-nnz scan's multi-minute compile —
    # the segment path hasn't changed since they were measured
    skipseg = "skipseg" in sys.argv[4:]
    # "only=tag1,tag2": measure a subset of the hybrid configs (cheap
    # one-off probes, e.g. head-budget sweeps)
    only = None
    for a in sys.argv[4:]:
        if a.startswith("only="):
            only = a[5:].split(",")
    n, m = PRESETS[preset]

    t0 = time.time()
    u, i, y = build_coo(n, m, int(nnz_m * 1e6))
    nnz = u.size
    print(f"host gen {time.time() - t0:.0f}s nnz={nnz / 1e6:.1f}M",
          flush=True)

    from hgaprec_tpu.config import ModelConfig
    from hgaprec_tpu.data.device import DeviceData

    results = {"preset": preset, "n": n, "m": m, "k": K, "nnz": int(nnz),
               "distribution": "user power(3.0), item zipf(1.2), dedup",
               "iters_per_dispatch": 5}
    suffix = "_scale_probe.json" if only else "_scale.json"
    out = os.path.join(ROOT, ".bench_cache", f"{preset}{suffix}")
    os.makedirs(os.path.dirname(out), exist_ok=True)

    def write_results():
        # incremental: a late-stage failure must not lose 40 minutes of
        # hardware measurements (learned when the f32 pallas VMEM OOM
        # killed the run after every hybrid number was already in hand)
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)
            fh.write("\n")

    # ---- pure segment mode on the raw COO (the pre-hybrid default) ----
    # sweep_segment_chunked touches only u_ids/i_ids/y; the item-order
    # arrays are aliased rather than uploaded (saves 3 x nnz x 4 bytes)
    t0 = time.time()
    j = jax.device_put
    ud, id_, yd = j(u), j(i), j(y)
    data = DeviceData(u_ids=ud, i_ids=id_, y=yd, item_order=ud,
                      i_ids_sorted=id_, u_ids_by_item=ud, dense_y=None)
    print(f"device data {time.time() - t0:.0f}s", flush=True)

    if skipseg:
        prev = os.path.join(ROOT, "docs", "artifacts",
                            f"{preset}_scale.json")
        if os.path.exists(prev):
            with open(prev) as f:
                pj = json.load(f)
            for key in ("ms_per_iter_bf16", "segment_ns_per_nnz"):
                if key in pj:
                    results[key] = pj[key]
            results["segment_carried_from_previous_run"] = True
            print("segment: carried from previous artifact", flush=True)
        state = None
    else:
        cfg_seg = ModelConfig(n=n, m=m, k=K, variant="hpf",
                              sweep="segment-chunked",
                              matmul_precision="default")
        ms, state = time_mode(cfg_seg, data, "segment_bf16")
        results["ms_per_iter_bf16"] = round(ms, 1)
        results["segment_ns_per_nnz"] = round(ms * 1e6 / nnz, 1)
    write_results()
    del data, state

    # ---- hybrid head/tail: free the raw COO first, then build the ----
    # head block ON DEVICE (a multi-GB host alloc would page-fault for
    # minutes in this sandbox; production hosts build it host-side in
    # build_device_data with the same byte budget)
    npad = -(-n // 512) * 512
    t_head = min(8192, int(head_gib * (1 << 30)) // npad // 512 * 512)
    deg = np.bincount(i, minlength=m)
    head_ids = np.sort(np.argsort(-deg, kind="stable")[:t_head])
    head_ids = head_ids.astype(np.int32)
    col_of = np.full(m, -1, np.int32)
    col_of[head_ids] = np.arange(t_head, dtype=np.int32)
    in_head = col_of[i] >= 0
    coverage = float(in_head.mean())
    ut, it_, yt = u[~in_head], i[~in_head], y[~in_head]
    del ud, id_, yd  # free raw COO from HBM before the head lands

    # chunked 2-D scatter: one monolithic z.at[uh, ch].set() materializes
    # an s32[P, 2] index tensor that XLA lane-pads 64x (19 GB at this
    # scale — OOMs the chip, learned on hardware); a scan over 256k-entry
    # chunks bounds the padded temp at ~134 MB
    CH = 1 << 18
    uh, chh = u[in_head], col_of[i[in_head]]
    yh = np.minimum(y[in_head], 255).astype(np.uint8)
    php = -(-uh.size // CH) * CH
    ext = php - uh.size   # repeat the last entry: same-value dup is a no-op
    uh = np.concatenate([uh, np.full(ext, uh[-1], uh.dtype)])
    chh = np.concatenate([chh, np.full(ext, chh[-1], chh.dtype)])
    yh = np.concatenate([yh, np.full(ext, yh[-1], np.uint8)])

    @jax.jit
    def build_head(uu, cc, vv):
        z = jnp.zeros((npad, t_head), jnp.uint8)

        def body(zc, xs):
            a, b, v = xs
            return zc.at[a, b].set(v), None

        z, _ = jax.lax.scan(body, z, (uu.reshape(-1, CH),
                                      cc.reshape(-1, CH),
                                      vv.reshape(-1, CH)))
        return z

    head_dense = build_head(jnp.asarray(uh), jnp.asarray(chh),
                            jnp.asarray(yh))
    _ = fence(head_dense)
    del uh, chh, yh
    pt = -(-max(ut.size, 1) // 1024) * 1024
    padt = pt - ut.size
    utp = j(np.concatenate([ut, np.full(padt, n - 1, np.int32)]))
    itp = j(np.concatenate([it_, np.full(padt, m - 1, np.int32)]))
    ytp = j(np.concatenate([yt, np.zeros(padt, np.float32)]))
    import dataclasses

    from hgaprec_tpu.ops.mxu_tail import build_tail_compact, mxu_tail_sweep
    tc = build_tail_compact(ut, it_, yt, n_users=n)
    data_h = DeviceData(u_ids=utp, i_ids=itp, y=ytp, item_order=utp,
                        i_ids_sorted=itp, u_ids_by_item=utp, dense_y=None,
                        head_items=j(head_ids), head_dense_y=head_dense,
                        u_ids_tail=utp, i_ids_tail=itp, y_tail=ytp)
    data_hm = dataclasses.replace(data_h, tail_compact=tc)
    print(f"head: T={t_head} coverage={coverage:.2f} "
          f"tail nnz={ut.size / 1e6:.1f}M", flush=True)
    results.update(head_T=t_head, head_coverage=round(coverage, 3),
                   tail_nnz=int(ut.size))

    state = None
    # tail impl is a static config field (cfg.tail_impl) so every row
    # below is guaranteed to measure the implementation it names — the
    # jit cache key includes it (advisor r4). pallas is the TPU default
    # (also under -precision highest: the tail runs bf16 tables
    # regardless, see sweep_hybrid's dtype policy), mxu the portable
    # fallback and the strict-f32 config.
    for dd, prec, tailimpl, tag in (
            (data_h, "default", "pallas", "hybrid_bf16"),
            (data_hm, "default", "pallas", "hybrid_pallas_bf16"),
            (data_hm, "highest", "pallas", "hybrid_pallas_f32state"),
            (data_hm, "default", "mxu", "hybrid_mxu_bf16"),
            (data_hm, "highest", "mxu", "hybrid_mxu_f32")):
        if only and tag not in only:
            continue
        cfg = ModelConfig(n=n, m=m, k=K, variant="hpf", sweep="hybrid",
                          matmul_precision=prec, tail_impl=tailimpl)
        try:
            # free the previous config's state BEFORE building the next
            # one: holding both full HPF states (2 x ~2.8 GB at NYT's
            # n=1.6M) beside the 4 GiB head block OOM'd the r5 NYT run
            state = None
            ms, state = time_mode(cfg, dd, tag)
        except Exception as e:  # record and continue — partial artifacts
            results[f"{tag}_error"] = str(e)[:200]
            write_results()
            continue
        results[f"ms_per_iter_{tag}"] = round(ms, 1)
        results[f"{tag}_ns_per_nnz"] = round(ms * 1e6 / nnz, 1)
        write_results()
    if state is None:
        print("no hybrid config succeeded; aborting", flush=True)
        return

    # itemrank scorer factors captured BEFORE the tail microbench so the
    # full training state (2.8 GB at NYT scale) and the multi-GB head
    # block can be freed — their overlap with a second state is what
    # OOM'd the first r5 NYT attempt
    from hgaprec_tpu.eval.score import scorer_from_state
    sc = scorer_from_state(state, cfg)
    state = None
    del data_h, data_hm, head_dense

    # tail-only microbench: ns per tail nonzero through the MXU sweep
    # (VERDICT r2 #2 asks for the tail cost alone vs the ~54 ns/nnz
    # gather-bound segment path and the 6 ns/row gather wall). The
    # scorer's e-expectations serve as the linear-space factor tables —
    # same shapes/dtypes as exp(Elog), no extra full state on chip.
    if ut.size:
        import functools as _ft
        a_lin = sc.su
        b_lin = sc.sv

        @_ft.partial(jax.jit, static_argnames=("bf16",))
        def tail_only(a, b, bf16=True):
            # reduce BOTH accumulators to scalars: returning only acc_a
            # lets XLA dead-code-eliminate the whole item-side half
            # (which is how r4's first artifact under-reported the tail
            # at 25 ns/nnz when the true both-sides cost was ~47)
            ra, rb, _, _ = mxu_tail_sweep(a, b, None, None, tc, bf16=bf16)
            return jnp.sum(ra) + jnp.sum(rb)

        r = tail_only(a_lin, b_lin)
        _ = fence(r)
        t0 = time.time()
        for _ in range(5):
            r = tail_only(a_lin, b_lin)
        _ = fence(r)
        tail_ms = (time.time() - t0) / 5 * 1e3
        results["tail_mxu_ms"] = round(tail_ms, 1)
        results["tail_mxu_ns_per_nnz"] = round(tail_ms * 1e6 / ut.size, 1)
        print(f"tail mxu: {tail_ms:.0f} ms "
              f"({tail_ms * 1e6 / ut.size:.1f} ns/nnz)", flush=True)
        write_results()

        from hgaprec_tpu.ops.pallas_tail import pallas_tail_sweep

        @_ft.partial(jax.jit, static_argnames=("bf16",))
        def tail_pallas(a, b, bf16=True):
            ra, rb, _, _ = pallas_tail_sweep(a, b, None, None, tc,
                                             bf16=bf16)
            return jnp.sum(ra) + jnp.sum(rb)

        r = tail_pallas(a_lin, b_lin)
        _ = fence(r)
        t0 = time.time()
        for _ in range(5):
            r = tail_pallas(a_lin, b_lin)
        _ = fence(r)
        tail_ms = (time.time() - t0) / 5 * 1e3
        results["tail_pallas_ms"] = round(tail_ms, 1)
        results["tail_pallas_ns_per_nnz"] = round(
            tail_ms * 1e6 / ut.size, 1)
        print(f"tail pallas: {tail_ms:.0f} ms "
              f"({tail_ms * 1e6 / ut.size:.1f} ns/nnz)", flush=True)
        write_results()
        del a_lin, b_lin, r

    # streamed ranking-eval timing (VERDICT r1 #5): rank 1000 heldout
    # (user, item) pairs among all M items with the device rank counter
    # — the [S, M] host matrix never exists at these shapes
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
    t0 = time.time()
    ranks, _ = item_ranks(sc, _StoreShim(), _IndexShim(), pairs_u, pairs_i)
    dt = time.time() - t0
    print(f"itemrank eval (1000 pairs x {m} items): {dt:.1f}s "
          "(incl. compile)", flush=True)
    results["itemrank_1000pairs_s"] = round(dt, 2)
    # label the cache state: the cold number includes jit compile, so it
    # swings with the persistent-cache hit/miss (r4's committed 0.4 s vs
    # cached 10.34 s disagreement was exactly this, unlabeled)
    results["itemrank_cold_includes_compile"] = True
    t0 = time.time()
    ranks, _ = item_ranks(sc, _StoreShim(), _IndexShim(), pairs_u, pairs_i)
    dt = time.time() - t0
    print(f"itemrank eval warm: {dt:.1f}s", flush=True)
    results["itemrank_1000pairs_warm_s"] = round(dt, 2)
    assert int(ranks.min()) >= 0 and int(ranks.max()) < m

    results["device_kind"] = jax.devices()[0].device_kind
    write_results()
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

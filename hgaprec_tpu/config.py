"""Configuration for models and runs.

Mirrors the capability surface of the reference `Env` struct
(/root/reference/src/env.hh:52-140) split TPU-natively into:

  * ModelConfig — static, hashable; closed over by jitted step functions.
  * RunConfig   — host-side operational knobs (dirs, cadence, seeds).

Unlike the reference, the Gamma hyperparameters (a, b, c, d) are real: the
reference parses -a/-b/-c/-d but hard-codes Gamma(0.3, 0.3) in the model
(/root/reference/src/hgaprec.cc:13-20, env.hh:295-305). We default to 0.3
for parity and actually honor overrides.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

# Execution paths for the phi sweep (hot loop).
SWEEP_DENSE = "dense"      # blocked dense matmuls on the MXU (SDDMM/SpMM densified per tile)
SWEEP_SEGMENT = "segment"  # gather + log-softmax + segment_sum (correctness baseline)
SWEEP_SEGMENT_CHUNKED = "segment-chunked"  # segment path streamed over nnz chunks
SWEEP_DENSE_PALLAS = "dense-pallas"  # fused VMEM-resident kernel (ops/dense_pallas.py)
SWEEP_HYBRID = "hybrid"    # dense head (top-degree items) + segment tail
SWEEP_AUTO = "auto"

VARIANT_BPF = "bpf"            # vb()        hgaprec.cc:919-980
VARIANT_HPF = "hpf"            # vb_hier()   hgaprec.cc:1321-1436
VARIANT_MLE_USER = "mle_user"  # vb_mle_user hgaprec.cc:982-1056
VARIANT_MLE_ITEM = "mle_item"  # vb_mle_item hgaprec.cc:1059-1130
VARIANT_CANNY = "canny"        # vb_canny    hgaprec.cc:1132-1216

_VARIANTS = (VARIANT_BPF, VARIANT_HPF, VARIANT_MLE_USER, VARIANT_MLE_ITEM,
             VARIANT_CANNY)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model description. Hashable; safe to close over under jit."""

    n: int                    # users
    m: int                    # items
    k: int                    # latent factors
    variant: str = VARIANT_BPF
    bias: bool = False        # user/item bias terms (-bias), phi gets K+2 slots
    binary: bool = False      # Bernoulli-Poisson link (-binary-data)
    vb: bool = True           # staggered swap order; False = -novb (synchronous)
    # Gamma priors. Reference effective values are all 0.3 (hgaprec.cc:13-20).
    a: float = 0.3            # theta shape prior
    b: float = 0.3            # theta rate prior
    c: float = 0.3            # beta shape prior
    d: float = 0.3            # beta rate prior
    # HPF scale priors (reference hard-codes 0.3: thetarate/betarate ctor,
    # hgaprec.cc:19-20).
    ap: float = 0.3           # xi (user activity) shape prior
    bp: float = 0.3           # xi rate prior
    cp: float = 0.3           # eta (item popularity) shape prior
    dp: float = 0.3           # eta rate prior
    dtype: str = "float32"
    # XLA matmul precision for the sweep/scoring dots. TPU defaults to
    # bf16-grade passes; "highest" keeps f32 parity with the f64 reference,
    # "default" trades ~0.4% relative error for MXU throughput.
    matmul_precision: str = "highest"
    sweep: str = SWEEP_AUTO
    # Hybrid-mode tail implementation: "auto" runs the Pallas windowed-DMA
    # kernel (ops/pallas_tail.py, bf16 tables — see sweep_hybrid for the
    # dtype rationale) on TPU and the portable XLA two-pass MXU sweep
    # (ops/mxu_tail.py) elsewhere; "pallas"/"mxu" force one. An explicit
    # static field (not an env var read at trace time) so jit cache keys
    # include the choice and A/B runs can't silently measure the same
    # implementation twice (advisor r4).
    tail_impl: str = "auto"
    # Dense path: item-block size for streaming the [N, M] products.
    item_block: int = 4096
    user_block: int = 8192
    # Data-layout knobs consumed at Trainer build time (host side):
    # catalogs whose dense uint8 matrix would exceed dense_limit_bytes
    # get the hybrid head/tail layout with up to hybrid_head_items
    # top-degree items in the dense head block, clipped to a
    # head_limit_bytes byte budget. The budget is a direct speed/HBM
    # lever on big-sparse catalogs — the head absorbs nonzeros at dense
    # MXU rates (~0.9 ns/nnz) while every tail nonzero costs ~29.5 ns
    # through the Pallas kernel. Measured (EchoNest preset, v5e):
    # 4 GiB -> 299 ms/iter, 5.5 -> 284, 7 -> 275. Default stays 4 GiB
    # so tall catalogs (NYT: 1.6M-row head blocks + 2.6 GB state and
    # its donation double) keep HBM headroom; raise via -head-gib when
    # the chip has room.
    hybrid_head_items: int = 8192
    dense_limit_bytes: int = 10 << 30
    head_limit_bytes: int = 4 << 30

    def __post_init__(self):
        if self.variant not in _VARIANTS:
            raise ValueError(f"unknown variant {self.variant!r}")
        if self.tail_impl not in ("auto", "pallas", "mxu"):
            raise ValueError(f"unknown tail_impl {self.tail_impl!r} "
                             "(auto|pallas|mxu)")
        if self.bias and self.variant in (VARIANT_MLE_USER, VARIANT_MLE_ITEM,
                                          VARIANT_CANNY):
            # reference asserts this combination away (hgaprec.cc:1505)
            raise ValueError("bias is not supported with MLE/Canny variants")

    @property
    def hier(self) -> bool:
        return self.variant == VARIANT_HPF

    @property
    def mle(self) -> bool:
        return self.variant in (VARIANT_MLE_USER, VARIANT_MLE_ITEM,
                                VARIANT_CANNY)

    def resolve_sweep(self) -> str:
        if self.sweep != SWEEP_AUTO:
            return self.sweep
        # Dense-blocked is the fast path whenever an [user_block, m] tile
        # stream is affordable; segment path otherwise.
        return SWEEP_DENSE if self.m <= 65536 else SWEEP_SEGMENT


@dataclasses.dataclass
class RunConfig:
    """Operational knobs (reference Env fields + output-dir contract)."""

    datdir: str = "."                 # -dir: train/test/validation tsv location
    outdir: Optional[str] = None      # override; default derives like env.hh:283-369
    label: str = ""                   # -label
    rfreq: int = 10                   # -rfreq: report cadence
    max_iterations: int = 1000        # -max-iterations (honored by hier; parity)
    seed: int = 0                     # -seed
    rating_threshold: int = 1         # -rating-threshold
    logl: bool = False                # -logl: training ELBO each report
    batch: bool = True
    enforce_max_iterations: bool = False  # reference: only vb_hier checks it
    num_precision_users: int = 1000   # sampled users per precision report (hgaprec.cc:1715)
    topn_by_user: int = 100           # _topN_by_user (hgaprec.cc:30)
    write_marginals: bool = True
    # TPU-native observability (SURVEY.md §5: the reference has none —
    # only wall-clock seconds in validation.txt): when set, training runs
    # under jax.profiler.trace(trace_dir) for TensorBoard/xprof.
    trace_dir: Optional[str] = None
    # bridge-mode flags — only used for output-dir naming parity
    # (env.hh:326-369); the actual dispatch lives in the CLI
    nmf: bool = False                 # -nmf or -nmfload
    lda: bool = False
    vwlda: bool = False
    chi: bool = False
    ctr: bool = False
    write_training: bool = False
    chi_tool: str = ""                # "nmf" | "als" | "wals" | "climf"
    wals_l: float = 0.1
    wals_C: int = 10

    def derive_outdir(self, mc: ModelConfig) -> str:
        """Reference output-dir naming (env.hh:283-369) for supported flags."""
        parts = [f"n{mc.n}-m{mc.m}-k{mc.k}"]
        if self.label:
            parts.append(self.label)
        else:
            base = os.path.basename(os.path.normpath(self.datdir))
            q = base[:2]
            if len(base) > 3 and q[:1].isalpha():
                parts.append(q)
        for nm, v in (("a", mc.a), ("b", mc.b), ("c", mc.c), ("d", mc.d)):
            if v != 0.3:
                parts.append(f"{nm}{v:g}")
        parts.append("batch" if self.batch else "online")
        if mc.binary:
            parts.append("bin")
        if mc.bias:
            parts.append("bias")
        if mc.hier:
            parts.append("hier")
        if mc.vb:
            parts.append("vb")
        # bridge suffixes in reference order (env.hh:326-369)
        if self.nmf:
            parts.append("nmf")
        if self.lda:
            parts.append("lda")
        if self.vwlda:
            parts.append("vwlda")
        if self.chi:
            parts.append("chi")
        if self.ctr:
            parts.append("ctr")
        if self.seed:
            parts.append(f"seed{self.seed:g}")
        if self.write_training:
            parts.append("write-training")
        if self.chi:
            if self.chi_tool == "nmf":
                parts.append("nmf")
            elif self.chi_tool == "als":
                parts.append("als")
            elif self.chi_tool == "wals":
                parts.append(f"wals-wl-{self.wals_l:g}-wC-{self.wals_C}")
            elif self.chi_tool == "climf":
                parts.append("climf")
        if mc.variant == VARIANT_MLE_USER:
            parts.append("mle-user")
        elif mc.variant == VARIANT_MLE_ITEM:
            parts.append("mle-item")
        elif mc.variant == VARIANT_CANNY:
            parts.append("canny")
        return "-".join(parts)

    def resolve_outdir(self, mc: ModelConfig) -> str:
        return self.outdir if self.outdir else self.derive_outdir(mc)

"""hgaprec_tpu — TPU-native hierarchical Gamma-Poisson factorization.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
premgopalan/hgaprec (Gopalan, Hofman & Blei, arXiv:1311.1704): Bayesian
Poisson Factorization (BPF), hierarchical HPF, bias terms, binary
(Bernoulli-Poisson) data, and MLE/Canny GaP variants, trained by CAVI.

Design stance (vs. the reference's GPMatrix/GPMatrixGR/GPArray object zoo
with curr/next double buffers, /root/reference/src/gpbase.hh): model state is
an immutable pytree of Gamma posteriors; one CAVI iteration is a pure jitted
function `state -> state`; the reference's swap() discipline is "return the
new pytree". The per-nonzero multinomial responsibility (phi) sweep is
expressed as SDDMM + SpMM so the FLOPs land on the MXU, with three
interchangeable execution paths (dense-blocked matmul, segment-sum, Pallas).
"""

__version__ = "0.1.0"

from hgaprec_tpu.config import ModelConfig, RunConfig

__all__ = ["ModelConfig", "RunConfig", "__version__"]

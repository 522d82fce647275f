"""Multi-host bootstrap for sharded CAVI training.

The reference is a single process with no distributed backend at all
(SURVEY §5: no MPI/NCCL/Gloo; pthread linked but never used). On TPU
pods the runtime layer below the mesh is `jax.distributed`: one Python
process per host, all chips of all hosts visible as `jax.devices()`
after initialization. The training code in `parallel/sharded.py` is
topology-agnostic — it shards over a single mesh axis spanning every
chip, and XLA lowers the per-iteration psums hierarchically (intra-host
over ICI first, one reduced [M, K] block per host over DCN), so no
DCN-specific code is needed in the model.

Usage (same script on every host):

    from hgaprec_tpu.parallel import distributed
    distributed.initialize_from_env()   # no-op for single-process runs
    run = build_sharded_run(store, cfg)  # mesh over all pod chips
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when a multi-process launch is detected.

    Resolution order: explicit arguments, then the standard JAX
    coordinator variables (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID), then Cloud-TPU/SLURM/OpenMPI autodetection built
    into jax.distributed.initialize (args all None). Returns True when
    distributed mode was initialized, False for a plain single-process
    run (nothing to do — jax.devices() is already the full local set).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    if coordinator is not None:
        import jax
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True

    # No explicit coordinator: auto-init only when the environment really
    # is a multi-worker pod. A single-chip TPU host can still export
    # TPU_WORKER_HOSTNAMES (one entry) — that is NOT a pod.
    hosts = [h for h in
             os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
             if h.strip()]
    if len(hosts) <= 1 and not os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        return False  # single process

    import jax
    jax.distributed.initialize()  # Cloud-TPU/SLURM/MPI autodetection
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write output files (process 0)."""
    import jax
    return jax.process_index() == 0


def local_device_slice(n_global_rows: int) -> slice:
    """Row range of the user axis owned by this host's devices, assuming
    the 1-D mesh enumerates devices in jax.devices() order (process-major).
    Used by the data loader to read only this host's user shard."""
    import jax
    per = n_global_rows // jax.process_count()
    p = jax.process_index()
    lo = p * per
    hi = n_global_rows if p == jax.process_count() - 1 else lo + per
    return slice(lo, hi)


def host_user_rows(n: int, ndev: Optional[int] = None) -> slice:
    """Seq-id training rows THIS host should ingest, for
    data.ratings.load_dataset(user_rows=host_user_rows): the user axis
    padded to a device multiple, partitioned process-major — the same
    row partition parallel.sharded.build_sharded_run derives, so a store
    holding only these rows feeds exactly this host's shards.

    Pass as the callable itself (it takes the ACTUAL user count, known
    only after the global id remap).
    """
    import jax
    ndev = ndev or jax.device_count()
    n_padded = -(-n // ndev) * ndev
    return local_device_slice(n_padded)

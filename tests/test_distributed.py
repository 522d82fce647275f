"""parallel.distributed: single-process bootstrap behavior."""

import jax

from hgaprec_tpu.parallel import distributed


def test_single_process_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert distributed.initialize_from_env() is False


def test_primary_and_slice_single_process():
    assert distributed.is_primary()
    s = distributed.local_device_slice(100)
    assert (s.start, s.stop) == (0, 100)
    assert jax.process_count() == 1

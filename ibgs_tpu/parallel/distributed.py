"""Multi-host process-group plumbing (SURVEY §2.5 / §5: the reference has
no distributed backend at all — this is net-new, TPU-native).

`initialize()` wires `jax.distributed.initialize` from either explicit
arguments or the standard environment (JAX infers everything on Cloud TPU
pods; elsewhere COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID are
honoured).  After it returns, `jax.devices()` spans every host in the
slice and the mesh builders below lay axes out so that the heavy
collectives (the gs-axis instance all_to_all, the dp grad psum) ride ICI
within a host's chips and only cross DCN on the outermost axis.

Single-process use is a no-op fallback — every entry point works unchanged
on one host, so the train driver calls `initialize()` unconditionally.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join (or create) the multi-host process group.  Returns True if a
    multi-process group is active, False for the single-process fallback."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    explicit = coordinator_address is not None
    auto_env = any(v in os.environ for v in
                   ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if explicit or auto_env:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
        except (RuntimeError, ValueError) as e:
            # RuntimeError: "must be called before any JAX calls" — the
            # backend is already up.  ValueError: "coordinator_address
            # should be defined" — an env var sniffed as a pod marker
            # (e.g. the remote-TPU relay plugin sets TPU_WORKER_HOSTNAMES)
            # without enough context for JAX to infer the group.  An
            # explicit multi-host request must fail loudly; the
            # env-sniffed path degrades to single-process.
            if explicit:
                raise
            print(f"[distributed] auto-init skipped ({e}); continuing "
                  f"single-process")
    _initialized = True
    return jax.process_count() > 1


def global_mesh(dp: int, axis2: int, axis_names=("dp", "gs")) -> Mesh:
    """Mesh over ALL processes' devices, laid out host-major so the inner
    axis stays within a host's ICI domain wherever dp*axis2 allows."""
    devices = jax.devices()
    assert len(devices) >= dp * axis2, (len(devices), dp, axis2)
    arr = np.asarray(devices[: dp * axis2]).reshape(dp, axis2)
    return Mesh(arr, axis_names=axis_names)


def process_local_batch(n_items: int) -> range:
    """The slice of a global dp batch this host feeds (hosts feed only
    their addressable shard under multi-host jit)."""
    per = n_items // max(jax.process_count(), 1)
    lo = jax.process_index() * per
    return range(lo, lo + per)

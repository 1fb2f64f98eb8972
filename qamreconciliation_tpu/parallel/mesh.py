"""Device mesh helpers.

The reference's only parallelism is a process pool over SNR points
(reference: sims/sim_reconciliation.py:57-93, via parfor).  The TPU-native
replacement is frame-shard data parallelism over a 1-D ``jax.sharding.Mesh``
("dp" axis): each device runs a full batch of frames and the four sweep
counters are ``psum``-reduced over ICI (SURVEY.md §2 parallelism table).

Multi-host pods compose transparently: ``jax.distributed.initialize`` before
calling :func:`make_mesh` makes ``jax.devices()`` span all hosts.
"""

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "device_count", "maybe_distributed_init"]


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis_name,))


def maybe_distributed_init():
    """Initialize jax.distributed when launched under a multi-host runtime.

    No-op on single-host (the common case in tests and single-chip runs).
    """
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        try:
            jax.distributed.initialize()
        except Exception:
            pass

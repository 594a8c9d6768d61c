"""Multi-host (multi-process) distributed runtime scaffold.

The reference has no distributed backend at all (SURVEY.md §5 lists the
communication backend as a deliverable; zero torch.distributed/NCCL hits in
/root/reference).  The TPU-native equivalent is JAX multi-controller SPMD:

  * every host runs the same program; :func:`initialize_multihost` wires the
    processes together (coordination service + NCCL-free XLA collectives —
    ICI within a slice, DCN across slices, gloo on CPU test rigs)
  * the mesh spans ALL processes' devices (``jax.devices()`` is global after
    init); jit with NamedShardings then compiles one SPMD program and XLA
    places collectives on ICI/DCN automatically
  * data loading is host-sharded: each process loads only its rows
    (:func:`host_shard_slice`), and :func:`make_global_batch` assembles the
    logical global batch from per-host locals without any host gathering
    (``jax.make_array_from_process_local_data``).

Environment-variable autodetection follows the common launcher conventions:
COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID (set by the launcher), and on
Cloud TPU ``jax.distributed.initialize()`` discovers everything natively.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from vats_tpu.parallel.mesh import logical_to_mesh_spec


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    cpu_collectives: Optional[str] = None,
) -> None:
    """Connect this process to the distributed JAX runtime.

    All arguments default from the environment (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID); on Cloud TPU VMs everything autodetects and
    this reduces to ``jax.distributed.initialize()``.  ``cpu_collectives``
    ('gloo' | 'mpi') enables cross-process collectives on CPU backends —
    used by the 2-process integration test (tests/test_multihost.py) and any
    CPU-based rehearsal of a multi-host job.

    Safe to call once per process, before any computation.  No-op when the
    runtime is already initialized.
    """
    # prior-init check must NOT touch the backend (jax.process_count() would
    # initialize XLA, after which distributed.initialize refuses to run)
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except Exception:
        pass
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    kwargs: Dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def host_shard_slice(total: int, *, drop_remainder: bool = True) -> slice:
    """This process's contiguous row range of a ``total``-row global batch.

    Each host feeds only its slice (host-sharded data loading); combined with
    :func:`make_global_batch` no host ever materializes the global batch.
    """
    n = jax.process_count()
    i = jax.process_index()
    if total % n != 0 and drop_remainder:
        total = (total // n) * n
    per = total // n
    return slice(i * per, (i + 1) * per)


def make_global_batch(
    local_batch: Dict[str, np.ndarray],
    mesh: Mesh,
    *,
    batch_logical_axes: Tuple[Optional[str], ...] = ("batch",),
) -> Dict[str, jax.Array]:
    """Assemble a logical global batch from this host's local rows.

    ``local_batch`` holds each array's PER-PROCESS rows (host-sharded
    loading); the returned jax.Arrays are global, sharded over the mesh's
    data axes, with zero cross-host data movement (each device addresses
    only rows its own host loaded).
    """

    def to_global(x):
        x = np.asarray(x)
        axes = batch_logical_axes + (None,) * (x.ndim - len(batch_logical_axes))
        sharding = NamedSharding(
            mesh, logical_to_mesh_spec(axes[: x.ndim], mesh=mesh)
        )
        return jax.make_array_from_process_local_data(sharding, x)

    return {k: to_global(v) for k, v in local_batch.items()}


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs (process 0)."""
    return jax.process_index() == 0

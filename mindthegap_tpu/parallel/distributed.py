"""Multi-host bring-up (SURVEY.md §5.8): jax.distributed + the global mesh.

The reference is single-process (no MPI/NCCL anywhere in its tree); scaling
past one host here is the standard JAX SPMD recipe:

  1. every host runs the same program and calls `init_distributed()`
     (jax.distributed.initialize — coordinator address/process id/count from
     the args or the usual env vars);
  2. `global_mesh()` lays all addressable+remote devices on one named axis;
  3. the phase entry points in parallel/mesh.py (distributed_count_step,
     make_sharded_scan_group_qp, walk_batch_sharded) already take a Mesh — on a
     multi-host mesh the same shard_map/psum code paths ride ICI within a
     slice and DCN across slices; XLA inserts the collectives;
  4. host 0 (jax.process_index() == 0) writes the merged artifacts —
     breakpoint ids renumbered after gather (deterministic, input order).

This module is thin glue by design: there is no custom wire protocol to
build (the reference has none to mirror), and every collective lives next
to the compute it serves in parallel/mesh.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime. No-op when single-process and no
    coordinator is configured (so single-host runs need no flags)."""
    import os

    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "shard") -> Mesh:
    """1-D mesh over every device of every participating host."""
    return Mesh(np.array(jax.devices()), (axis,))


def is_writer() -> bool:
    """True on the host that writes merged artifacts (host 0)."""
    return jax.process_index() == 0


def allgather_object(obj) -> list:
    """Gather one picklable object per process; every process returns the
    list [obj_proc0, obj_proc1, ...]. Two collectives: max-length, then the
    padded byte buffers (jax.experimental.multihost_utils) — the merge path
    for fill-job results (the reference's Dispatcher gather has no
    multi-host analog; SURVEY.md §2.3 row 2)."""
    import pickle

    from jax.experimental import multihost_utils as mu

    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = np.asarray(mu.process_allgather(np.array([buf.size], np.int64)))
    lens = lens.reshape(-1)
    m = int(lens.max())
    pad = np.zeros(m, np.uint8)
    pad[: buf.size] = buf
    allb = np.asarray(mu.process_allgather(pad))
    return [
        pickle.loads(allb[i, : int(lens[i])].tobytes()) for i in range(allb.shape[0])
    ]


def shard_bounds(n_items: int, n_shards: int, shard: int) -> tuple[int, int]:
    """Contiguous [lo, hi) bounds of `shard` when n_items are split as evenly
    as possible — the job/window partitioning used for find windows and fill
    jobs (deterministic merge = concatenation in shard order)."""
    base, rem = divmod(n_items, n_shards)
    lo = shard * base + min(shard, rem)
    hi = lo + base + (1 if shard < rem else 0)
    return lo, hi

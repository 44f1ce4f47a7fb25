"""Multi-host (pod-slice) orchestration helpers.

The single-controller JAX model: every host runs the same program,
`jax.distributed.initialize` wires them into one runtime, and the mesh in
parallel/dp.py simply spans all global devices — the train step itself is
unchanged (shard_map + psum ride ICI within a slice and DCN across slices).

Host-local input pipeline: each host loads only the views for its own data-
axis rows (the reference's nearest concept is dataloader workers; here the
sharding is across machines). `host_local_batch` builds the global arrays
from per-host shards.

Untestable on this machine (one host, one chip) — kept deliberately thin so
the only multi-host-specific code is array placement.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op on a single process).

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly for CPU/GPU clusters."""
    import jax
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_mesh(tile_parallel: Optional[int] = None,
                     model_parallel: int = 1):
    """Mesh over ALL global devices (call after initialize())."""
    from threedgrut_tpu.parallel.dp import make_mesh
    return make_mesh(None, tile_parallel, model_parallel)


def host_local_batch(mesh, per_host_arrays):
    """Assemble global data-sharded arrays from per-host numpy shards.

    per_host_arrays: pytree of numpy arrays whose leading axis is THIS
    host's slice of the global batch. Returns jax Arrays sharded P("data")
    over the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(place, per_host_arrays)


def my_view_indices(num_views: int, batch_size: int, step: int,
                    seed: int = 0) -> Sequence[int]:
    """Deterministic per-host view assignment: all hosts compute the same
    global schedule and slice their own rows."""
    import jax
    rng = np.random.default_rng(seed * 100003 + step // max(num_views, 1))
    perm = rng.permutation(num_views)
    global_rows = [int(perm[(step * batch_size + i) % num_views])
                   for i in range(batch_size)]
    pid = jax.process_index()
    nproc = jax.process_count()
    per_host = batch_size // nproc
    return global_rows[pid * per_host:(pid + 1) * per_host]

"""Multi-host (DCN) scaffolding: process init, per-host data feeding, and
host-sharded string tables.

The reference is strictly single-node (SURVEY §2a.7); its scaling story
stops at multi-GPU fan-out inside one box. The TPU-native design for
multiple hosts (SURVEY §5, distributed entry) is: **one JAX process per
host**, the library column-sharded over the *global* mesh exactly as over
a single host's devices (``parallel/sharded.py`` — the SPMD program is
unchanged; XLA routes the ``all_gather`` over ICI within a slice and DCN
across), with two host-side consequences handled here:

* each process feeds only the rows its local devices own
  (:func:`distribute_rows` via ``jax.make_array_from_process_local_data``)
  — no host ever materializes the whole library;
* SMILES/ID string tables are sharded per host by global row span
  (:class:`HostStrings`): device shards own contiguous global column
  ranges, so the rows a host can resolve are exactly its local span.

Real DCN runs need real multi-host hardware; everything here is exercised
by the 2-process CPU smoke test (``tests/test_multihost.py``), which runs
the full sharded search on a Gloo-backed global mesh.
"""

from __future__ import annotations

import numpy as np

from .mesh import SHARD_AXIS


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join the multi-process JAX runtime (``--coordinator host:port``).

    Must run before any jax device access; afterwards ``jax.devices()``
    spans every process and a mesh built from it is a global mesh.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_row_span(mesh, n_padded: int) -> tuple[int, int]:
    """Global row range [lo, hi) owned by THIS process's devices.

    Shards own contiguous column ranges in mesh-device order (the flattened
    1-D mesh), so a process's span is contiguous as long as its devices are
    contiguous in the mesh (the default ordering from ``jax.devices()``).
    """
    import jax

    devs = list(mesh.devices.reshape(-1))
    n_shards = len(devs)
    if n_padded % n_shards:
        raise ValueError(
            f"n_padded={n_padded} is not divisible by {n_shards} shards — "
            "pad rows to the shard count before computing spans"
        )
    per_shard = n_padded // n_shards
    mine = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    if not mine:
        return (0, 0)
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise ValueError(
            "this process's devices are not contiguous in the mesh; "
            "order the mesh by process for contiguous string-table spans"
        )
    return (mine[0] * per_shard, (mine[-1] + 1) * per_shard)


def distribute_rows(local_planar: np.ndarray, local_pops: np.ndarray, mesh,
                    axis: str = SHARD_AXIS):
    """Form global device arrays from each process's LOCAL planar slice.

    ``local_planar`` is ``uint32 (W, n_local)`` — this process's columns
    only (its :func:`process_row_span`); ``local_pops`` is ``int32
    (n_local,)``. Returns ``(words, pops)`` global jax Arrays sharded
    ``P(None, axis)`` / ``P(axis)``, suitable for
    ``sharded.build_store_from_device`` / ``ShardedStore``.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    words = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, axis)), np.ascontiguousarray(local_planar)
    )
    pops = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), np.ascontiguousarray(local_pops)
    )
    return words, pops


class HostStrings:
    """String table for this host's global row span only.

    At 1B rows the SMILES/ID tables are tens of GB; sharding them per
    host by the span of rows the host's devices own keeps each host's
    share proportional. ``get`` returns ``None`` for rows owned by other
    hosts — the serving front end resolves those from the owning host (or
    serves from a host holding full mmap'd tables; see ``utils/tfsim``).
    """

    def __init__(self, strings, lo: int, hi: int):
        if hi - lo < len(strings):
            raise ValueError(f"span [{lo}, {hi}) smaller than {len(strings)} strings")
        self._strings = strings
        self.lo = lo
        self.hi = hi

    def __len__(self) -> int:
        return len(self._strings)

    def owns(self, global_index: int) -> bool:
        return self.lo <= global_index < self.lo + len(self._strings)

    def get(self, global_index: int):
        if not self.owns(global_index):
            return None
        return self._strings[global_index - self.lo]

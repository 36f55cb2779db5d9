"""Multi-host (pod-slice) helpers for in-process data parallelism.

The production layout is the reference's shared-nothing cluster DP — one
engine process per host, fanned out by ``runner/pod_runner.py`` with
hub-as-ledger idempotence (SURVEY §2.2) — which needs nothing from this
module. These helpers cover the OPTIONAL in-process alternative: one
logical engine spanning all hosts of a TPU slice, batch sharded over ICI.

    from tokenize_audio_tpu.parallel import multihost
    multihost.init_distributed()            # env-driven on TPU pods
    mesh = multihost.global_mesh()          # all chips of the slice
    engine = MimiEncoderEngine(params, cfg, ecfg, mesh=mesh)

Under a multi-process runtime each host feeds its own rows
(``host_local_to_global`` assembles the global sharded batch without any
cross-host copy of audio data) and reads back only its addressable rows —
codes never cross DCN; only XLA's ICI collectives run inside the step.

The engine's multiprocess branch (``MimiEncoderEngine._device_batch``)
uses a different upload model: every process passes the same full
utterance list (keeping the collective program launches SPMD-consistent)
and materializes each local device's addressable shard straight from the
planned batch via ``jax.make_array_from_callback`` — valid for ANY
(data, model) decomposition, including tp spanning hosts where neighbor
processes hold replicas of one data block (a row-span upload through
``host_local_to_global`` mis-assembles there: the global shape is
inferred from the local rows). The tiny code arrays all-gather back so
every host returns the full result. The helpers below remain the right
tool for the pure-DP layout where each host feeds distinct rows.

Exercised FOR REAL — 2 and 4 processes x 2 virtual CPU devices under
``jax.distributed`` — by tests/test_multiprocess_dp.py: the raw helpers
path, the engine branch, and the dp<process_count tp-spanning engine are
all pinned bit-equal to a single-process encode.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime. On Cloud TPU pods all three
    arguments are discovered from the environment; pass them explicitly for
    other fabrics. Must run before any other JAX call in the process."""
    import jax

    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def global_mesh(dp: Optional[int] = None, tp: int = 1):
    """A (data, model) mesh over every chip of the slice (all processes).
    Identical to parallel.mesh.make_mesh but explicit that jax.devices()
    is GLOBAL under a multi-process runtime."""
    from tokenize_audio_tpu.parallel.mesh import make_mesh

    return make_mesh(dp=dp, tp=tp)


def host_local_to_global(batch: np.ndarray, mesh, spec=None):
    """Assemble a globally-sharded array from each process's local rows.

    Single-process: plain device_put with the sharding (so engine code is
    process-count agnostic). Multi-process: every host contributes its
    ``batch`` as its shard of the leading (data) axis — the global batch
    size is ``batch.shape[0] * process_count`` and no audio bytes cross
    hosts.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.make_array_from_process_local_data(sharding, batch)


def local_rows(global_array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in axis order.
    The inverse of host_local_to_global for reading results back without
    fetching other hosts' shards over DCN."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(global_array)
    # replica_id filter: under tp>1 (or replication) several local devices
    # hold copies of the same row block — keep one copy per block
    shards = sorted(
        (s for s in global_array.addressable_shards if s.replica_id == 0),
        key=lambda s: s.index[0].start or 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def process_span(n_global_rows: int) -> tuple[int, int]:
    """[start, stop) row range this process owns of an evenly batch-sharded
    global axis. The batch MUST divide evenly over the processes (the
    engine sizes every batch to a multiple of lcm(dp, process_count));
    flooring a remainder away here would silently never encode those rows."""
    import jax

    per, rem = divmod(n_global_rows, jax.process_count())
    if rem:
        raise ValueError(
            f"batch of {n_global_rows} rows does not divide evenly over "
            f"{jax.process_count()} processes; size batches to a multiple "
            "of the process count"
        )
    start = per * jax.process_index()
    return start, start + per

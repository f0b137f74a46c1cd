"""Multi-host initialization and host-sharded data loading.

TPU-native equivalent of the reference's process-level parallelism story
(SURVEY.md §5.8): `jax.distributed.initialize()` per host, one global mesh
spanning ICI within a slice and DCN across slices, scene/data sharding by
`jax.process_index()`, and XLA-emitted collectives (no user-level NCCL
analogue). The engine stages need no cross-host communication at all —
scenes shard across hosts; only the model path uses collectives.
"""

from __future__ import annotations

from typing import Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the jax distributed runtime (no-op when single-process
    or already initialized). On TPU pods the arguments are auto-detected
    from the environment; pass them explicitly on CPU/GPU clusters."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (tests, one-host dev): nothing to do
        pass


def host_shard(items: Sequence[T],
               process_index: int | None = None,
               process_count: int | None = None) -> list[T]:
    """The slice of `items` this host owns (stable round-robin by index).

    Used to shard scene lists / npz files / JSONL shards across hosts —
    the share-nothing unit of the data engine (reference: Pool over scenes
    + bash range sharding, SURVEY.md §2.5)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [item for i, item in enumerate(items) if i % pc == pi]


def global_batch_slice(global_batch: int,
                       process_index: int | None = None,
                       process_count: int | None = None) -> tuple[int, int]:
    """(start, size) of this host's rows in a globally-batched array."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch % pc == 0, (global_batch, pc)
    per = global_batch // pc
    return pi * per, per

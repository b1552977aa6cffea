"""Multi-host input sharding for the page corpus.

SURVEY.md §5 (distributed backend): on a multi-host TPU pod the page
corpus is split over hosts on DCN — each host rasterizes and uploads only
its shard, ICI carries the model collectives (the reference is strictly
single-GPU, base_infer_task.py:69). These helpers are pure functions over
(process_index, process_count) so the sharding math is unit-testable
without multiple processes; `initialize()` is the thin jax.distributed
entry.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """jax.distributed init (no-op on a single host). Returns
    (process_index, process_count)."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def shard_bounds(n_items: int, process_index: int,
                 process_count: int) -> Tuple[int, int]:
    """Contiguous [lo, hi) bounds of this host's shard. Remainder pages go
    to the LEADING hosts one each, so shard sizes differ by at most 1 and
    every page is owned by exactly one host."""
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} out of range "
                         f"[0, {process_count})")
    base, rem = divmod(n_items, process_count)
    lo = process_index * base + min(process_index, rem)
    hi = lo + base + (1 if process_index < rem else 0)
    return lo, hi


def shard_pages(pages: Sequence, process_index: int,
                process_count: int) -> List:
    """This host's contiguous slice of the page corpus (contiguous keeps
    per-PDF locality: a document's pages land on one host so its
    pdf_doc handle opens once)."""
    lo, hi = shard_bounds(len(pages), process_index, process_count)
    return list(pages[lo:hi])


def merge_sharded_results(per_host: Sequence[Sequence]) -> List:
    """Concatenate per-host result lists back into corpus order (hosts
    hold contiguous shards, so plain concatenation is order-preserving)."""
    out: List = []
    for chunk in per_host:
        out.extend(chunk)
    return out

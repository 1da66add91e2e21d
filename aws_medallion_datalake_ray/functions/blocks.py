"""Block-shape utilities for shuffle-friendly pipelines.

The one that matters at 100 TB: **rebundle before narrow-row shuffles**.
Ray returns task outputs smaller than ~100 KB BY VALUE into the owner's
process — and every block of a Dataset pipeline is owned by the DRIVER.  A
hash/sort shuffle (``groupby`` / ``sort``) splits each upstream block into
one piece per reduce partition, so a pipeline of narrow rows (hashes,
counts, key pairs — 8-32 B/row) whose map stage emits many small blocks
parks essentially the whole shuffle volume in the driver heap as in-band
objects: measured on this engine, a 40M-row × 24 B shuffle drove the
driver's ru_maxrss from 165 MB to 2.7 GB; with one rebundling pass first it
stayed at 191 MB (see BASELINE.md round 4).  At 10^9+ rows that is a driver
OOM, not a slowdown.

``rebundle`` is an identity ``map_batches`` that coalesces blocks to
``target_rows`` so each shuffle piece (``block_rows × row_width / P``)
clears the in-band threshold and lands in plasma where it belongs.  Size
``target_rows`` for the ROW WIDTH at the call site (2M × 24 B ≈ 48 MB
blocks → 64-partition pieces ≈ 750 KB): it is meant for narrow-row
datasets — rebundling 2M rows of 1 KB documents would build 2 GB blocks.
"""

from __future__ import annotations

from ray.data import Dataset


def rebundle(ds: Dataset, num_blocks: int | None = None) -> Dataset:
    """Coalesce a narrow-row dataset into a FIXED number of large blocks
    (``repartition`` without shuffle — split/merge by reference, no
    all-to-all) so the downstream sort/groupby shuffle produces
    ``num_blocks x num_partitions`` pieces of ``volume / n^2`` bytes — large
    enough to clear Ray's ~100 KB in-band threshold and stream through
    plasma instead of the driver heap.

    Why not an identity ``map_batches(batch_size=big)``: it FUSES with the
    upstream map and Ray sizes the fused task's input bundle from the big
    output batch, collapsing an expensive upstream stage to a handful of
    tasks (measured on the near-dup scan: 120 banding tasks -> 3, wall
    8 s -> 15.5 s).  An actor-pool identity breaks fusion but serializes
    the stream through the pool (113 s).  ``repartition(n)`` is an
    all-to-all BARRIER in the plan, but every consumer of rebundle is a
    groupby/sort which is a barrier anyway — the extra pass costs one
    read of the (narrow) intermediate.

    Driver exposure is then BOUNDED: pieces only fall below the in-band
    threshold when ``volume < n^2 x 100 KB`` (n=64: ~400 MB total, and the
    exposure shrinks as volume grows past it), versus the unbounded
    O(volume) driver heap of the many-small-blocks shape."""
    if num_blocks is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_blocks = max(8, 2 * ncpu)
    return ds.repartition(num_blocks)
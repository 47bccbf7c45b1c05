"""Crash-safe versioned snapshot store for the *_maintain handlers.

The maintain loops (CMS cells, HLL sketches, value histograms) persist
a bounded merged table per micro-batch. A plain
``mode('overwrite')`` on the live directory has a failure window: Spark
deletes the old data before the new write commits, so a crash
mid-overwrite destroys the entire accumulated state while the batch
ledger leaves the batch unmarked — replay then rebuilds from the delta
alone and the "effectively-once" claim breaks.

This store writes every snapshot to a fresh version directory
(``<base>/v<batch_id>``) and flips a pointer file (``<base>/CURRENT``)
via ``os.replace`` — atomic on POSIX — only after the parquet commit.
A crash at ANY point leaves the pointer on the previous complete
snapshot; the unmarked batch replays and re-merges against that intact
state. The previous version is kept (N=1 retained history) and older
ones pruned, so disk stays at ~2 snapshot sizes.
"""

from __future__ import annotations

import os
import shutil

_PTR = "CURRENT"


def _ptr_path(base: str) -> str:
    return os.path.join(base, _PTR)


def store_exists(base: str) -> bool:
    """True iff a complete committed snapshot exists."""
    return os.path.exists(_ptr_path(base))


def _current(base: str) -> str:
    with open(_ptr_path(base)) as f:
        return f.read().strip()


def store_read(spark, base: str):
    """Read the current committed snapshot."""
    return spark.read.parquet(os.path.join(base, _current(base)))


def store_write(spark, rows, schema, base: str, version: int) -> None:
    """Commit ``rows`` as snapshot ``v<version>`` and flip the pointer.

    ``rows`` is a collected local relation (the maintain tables are
    bounded by construction), so the write never reads its own input.
    Safe to re-run for a replayed unmarked batch: the stale version dir
    from the failed attempt is recreated, and the merge inputs (the
    still-live previous snapshot + the deterministic delta) are
    unchanged.
    """
    os.makedirs(base, exist_ok=True)
    vdir = f"v{version}"
    target = os.path.join(base, vdir)
    if os.path.isdir(target):  # leftover from a crashed attempt
        shutil.rmtree(target)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(target)
    prev = _current(base) if store_exists(base) else None
    tmp = _ptr_path(base) + ".tmp"
    with open(tmp, "w") as f:
        f.write(vdir)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _ptr_path(base))
    keep = {vdir, prev}
    for d in os.listdir(base):
        p = os.path.join(base, d)
        if d.startswith("v") and d not in keep and os.path.isdir(p):
            shutil.rmtree(p)

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
A crash BEFORE the flip leaves the pointer on the previous complete
snapshot; the unmarked batch replays and re-merges against that intact
state. The previous version is kept (N=1 retained history) and older
ones pruned, so disk stays at ~2 snapshot sizes.

The pointer doubles as the COMMIT RECORD for the crash window AFTER
the flip but BEFORE the caller's ledger mark (ADVICE r4): if CURRENT
already names ``v<batch_id>``, the batch's merge is already in the
committed snapshot — re-merging it would double-count, and rewriting
would rmtree the very directory the pointer references (a second crash
mid-rewrite then leaves the pointer dangling). Maintainers must call
``store_committed(base, batch_id)`` before merging a replayed batch
and, when true, only re-mark their ledger; ``store_write`` also
refuses, as a backstop, to rebuild a version the pointer already
references.
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


def store_committed(base: str, version: int) -> bool:
    """True iff snapshot ``v<version>`` is the committed CURRENT one.

    The commit-record check for the flip-then-crash-before-ledger-mark
    window: a replayed batch whose version the pointer already names
    must NOT be re-merged (its delta is already inside the snapshot) —
    the maintainer just re-marks its ledger and returns.
    """
    return store_exists(base) and _current(base) == f"v{version}"


def store_write(spark, rows, schema, base: str, version: int) -> None:
    """Commit ``rows`` as snapshot ``v<version>`` and flip the pointer.

    ``rows`` is a collected local relation (the maintain tables are
    bounded by construction), so the write never reads its own input.
    Safe to re-run for a replayed unmarked batch: if the crash hit
    BEFORE the pointer flip, the stale uncommitted version dir is
    recreated from unchanged inputs (still-live previous snapshot +
    deterministic delta); if it hit AFTER the flip, the commit-record
    guard below makes this call a no-op instead of a double-merge.
    """
    os.makedirs(base, exist_ok=True)
    vdir = f"v{version}"
    target = os.path.join(base, vdir)
    if store_committed(base, version):
        # Backstop for the flip-then-crash window: this version IS the
        # live committed snapshot. Deleting and rebuilding it would (a)
        # double-count the re-merged delta the caller just computed and
        # (b) leave the pointer dangling if a second crash lands
        # mid-rewrite. The caller re-marks its ledger and moves on.
        return
    if os.path.isdir(target):  # leftover from a crashed UNCOMMITTED attempt
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

"""Shared epoch-dir state plumbing for foreachBatch pipelines
(streaming/minhash.py, streaming/packing.py — r12, factored after the
packing module re-implemented the reader and missed the local-path
guard).

State layout contract: parquet facts under ``root/<sub>/epoch=N/``,
append-only, one dir per epoch, rewritten idempotently on at-least-once
re-delivery. Listing and compaction use os-level calls, so state MUST
live on a local filesystem (or a mount that behaves like one) — a
remote URI would silently list as EMPTY and corrupt downstream state.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame


def require_local(state_dir: str) -> str:
    """Raise on URI-schemed state dirs: the os.listdir/os.rename seams
    here do not speak object stores; failing loudly beats silently
    reading prior state as empty (r11 ADVICE). A multi-node deployment
    keeps state on a shared mount or swaps these seams for its
    object-store lister/committer."""
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", state_dir):
        raise ValueError(
            f"state_dir must be a local filesystem path, got {state_dir!r} "
            "(listing/compaction use os.listdir/os.rename)"
        )
    return state_dir


def superseded_epoch_dirs(path: str) -> set[str]:
    """Union of every generation dir's ``_FOLDED`` marker under `path`
    — the epoch dir names a compaction has replaced (and will delete;
    a lingering one is the compaction's crash window)."""
    superseded: set[str] = set()
    for e in os.listdir(path):
        if e.startswith("epoch="):
            marker = os.path.join(path, e, "_FOLDED")
            if os.path.isfile(marker):
                with open(marker) as fh:
                    superseded |= {s for s in fh.read().split() if s}
    return superseded


def live_epoch_dirs(path: str) -> list[str]:
    """Epoch dir names under `path` that are NOT superseded by a
    compacted generation. Each generation dir carries a ``_FOLDED``
    marker listing every epoch dir it replaced (written atomically with
    the generation's rename-into-place), so a crash between the
    generation publish and the old-dir deletions can never DOUBLE facts
    for any reader: lingering superseded dirs are filtered here, for
    SUM consumers (packing's base offset) as much as DISTINCT ones
    (minhash pairs)."""
    entries = [e for e in os.listdir(path) if e.startswith("epoch=")]
    superseded = superseded_epoch_dirs(path)
    return sorted(e for e in entries if e not in superseded)


def assert_epoch_writable(root: str, sub: str, epoch_id: int) -> None:
    """Fail loudly when ``epoch=epoch_id`` was already FOLDED into a
    compacted generation: writing it again means the streaming
    checkpoint restarted epoch numbering against existing state (reset
    or rebuilt checkpoint, same state_dir) — the new dir would be
    filtered by every reader as a compaction leftover and DELETED by
    the next compaction, silent data loss. A checkpoint and its
    state_dir must live and die together; start a fresh state_dir with
    a fresh checkpoint."""
    path = os.path.join(root, sub)
    if os.path.isdir(path) and f"epoch={int(epoch_id)}" in superseded_epoch_dirs(path):
        raise ValueError(
            f"epoch={int(epoch_id)} under {path!r} was already folded into a "
            "compacted generation — the streaming checkpoint appears to have "
            "been reset against existing state (its epoch numbering "
            "restarted); writes under a superseded epoch id are invisible to "
            "readers and deleted by the next compaction. Use a fresh "
            "state_dir with the fresh checkpoint (or resume the original "
            "checkpoint)"
        )


def read_epoch_state(spark, root: str, sub: str, schema: str) -> DataFrame:
    """Read the union of all LIVE epoch dirs under root/sub with a
    PINNED schema (an empty first epoch must not poison inference); the
    discovered epoch partition column is appended regardless of the
    pinned schema — project it away so consumers see exactly the
    declared columns. Epoch dirs superseded by a compaction but not yet
    deleted (its crash window) are excluded — see live_epoch_dirs."""
    from pyspark.sql.types import StructType

    path = os.path.join(root, sub)
    # parse with the real DDL parser, not schema.split(',') — a nested
    # comma type (map<string,int>, struct<a:int,b:int>) would silently
    # shred into garbage column names (r12 ADVICE)
    cols = StructType.fromDDL(schema).fieldNames()
    if os.path.isdir(path):
        live = live_epoch_dirs(path)
        if live:
            return (
                spark.read.option("basePath", path)
                .schema(schema)
                .parquet(*[os.path.join(path, e) for e in live])
                .select(*cols)
            )
    return spark.createDataFrame([], schema)


def compact_epoch_dirs(
    spark, root: str, sub: str, schema: str, key: str | None = None,
    n_buckets: int = 1,
) -> None:
    """Fold all epoch dirs under root/sub into ONE generation dir — the
    maintenance pass a long-running ingest schedules between drains
    (a year of hourly drops is ~9k epoch dirs; file-listing cost and
    per-file open overhead grow with every epoch until compaction).
    Factored from compact_minhash_state (r13) so the packing state can
    reuse the exact same crash-safety argument.

    Rows are unioned VERBATIM (append-only facts — no merge logic to
    get wrong) and land under a NEGATIVE generation epoch (``epoch=-1``,
    then -2, …), hash-bucketed by `key` when given (else coalesced to
    n_buckets files). If the pinned schema itself names ``epoch``, the
    column is dropped before the write and re-provided by the new
    generation's partition dir — every compacted row reads back with
    the generation's epoch, which consumers must treat as "before all
    live epochs" (sums/maxes over facts are invariant to it; per-epoch
    identity is NOT preserved across compaction).

    Crash safety: the new generation is written to an underscore temp
    dir (invisible to readers) TOGETHER with a ``_FOLDED`` marker
    listing every epoch dir it supersedes (live AND any still-lingering
    dirs a previous crash left — transitively, so a chain of interrupted
    compactions cannot resurrect an already-folded dir after its own
    generation's marker is deleted), renamed into place ATOMICALLY, and
    only then are the superseded dirs removed. At no point does a crash
    leave fewer facts than before, and — because every reader filters
    superseded dirs via live_epoch_dirs — at no point does it leave
    MORE: the crash window is invisible even to SUM consumers like the
    packing base offset (a lingering un-deleted epoch beside the new
    generation would otherwise double its tokens into every later
    offset). Deletion retries for free: the next compaction lists the
    leftovers and folds/deletes them again. Must run BETWEEN drains (no
    concurrent writer, no uncommitted epoch in the checkpoint), and
    root must be LOCAL (require_local: listing and the atomic-rename
    publish are os-level)."""
    import shutil

    require_local(root)
    path = os.path.join(root, sub)
    if not os.path.isdir(path):
        return
    # everything present, including superseded leftovers from a prior
    # crash — they all get folded into the new marker and deleted below
    entries = [e for e in os.listdir(path) if e.startswith("epoch=")]
    if len(entries) <= 1:
        return
    gens = [int(e.split("=", 1)[1]) for e in entries]
    new_gen = min(min(gens), 0) - 1  # -1 first, then -2, ...
    cur = read_epoch_state(spark, root, sub, schema)  # live dirs only
    if "epoch" in cur.columns:
        cur = cur.drop("epoch")
    tmp = os.path.join(path, "_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    out = cur.repartition(n_buckets, key) if key else cur.coalesce(n_buckets)
    out.write.parquet(tmp)
    # fsync marker bytes AND the parent dir before the rename publish:
    # without it a power loss could persist the rename while the marker
    # blocks don't, making both generations live — the exact double the
    # marker exists to prevent (process crashes alone don't need this;
    # the page cache survives them)
    marker = os.path.join(tmp, "_FOLDED")
    with open(marker, "w") as fh:
        fh.write(" ".join(entries))
        fh.flush()
        os.fsync(fh.fileno())
    dfd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    # atomic publish BEFORE any deletion: a crash from here on leaves
    # the new generation plus superseded dirs its marker filters out
    os.rename(tmp, os.path.join(path, f"epoch={new_gen}"))
    for e in entries:
        shutil.rmtree(os.path.join(path, e), ignore_errors=True)

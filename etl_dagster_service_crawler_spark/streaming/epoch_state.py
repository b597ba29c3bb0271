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


def read_epoch_state(spark, root: str, sub: str, schema: str) -> DataFrame:
    """Read the union of all epoch dirs under root/sub with a PINNED
    schema (an empty first epoch must not poison inference); the
    discovered epoch partition column is appended regardless of the
    pinned schema — project it away so consumers see exactly the
    declared columns."""
    path = os.path.join(root, sub)
    cols = [c.strip().split(" ", 1)[0] for c in schema.split(",")]
    if os.path.isdir(path) and any(
        e.startswith("epoch=") for e in os.listdir(path)
    ):
        return spark.read.schema(schema).parquet(path).select(*cols)
    return spark.createDataFrame([], schema)

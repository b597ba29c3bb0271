"""Array/map/struct column functions.

Generalize the reference's collection handling:

- kv_lookup      <- reference test.py:217-374: 13 sequential scans of
                    the same (h3-title, data) row list. Here it is ONE
                    map_from_entries pass + element_at per key — O(1)
                    lookups after a single build, all codegen'd.
- map_build      <- reference test.py:42-60, 425-431 (zip legend
                    labels with values)
- array_join_ws  <- reference test.py:209,335,347,359,381,388 ('、'
                    joins)
- nested struct  <- reference test.py:423-534 (job_info struct of 8
                    maps; 30-field record assembly)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def kv_entries(*pairs: tuple[str, Column]) -> Column:
    """Build array<struct<k,v>> from (key, value-column) pairs."""
    return F.array(*[F.struct(F.lit(k).alias("k"), v.alias("v")) for k, v in pairs])


def kv_lookup(entries: Column, key: str) -> Column:
    """element_at over map_from_entries — the P2 pivot-lookup."""
    return F.element_at(F.map_from_entries(entries), key)


def map_build(keys: Column, vals: Column) -> Column:
    """Zip two arrays into a map (reference's legend zip)."""
    return F.map_from_entries(F.arrays_zip(keys.alias("k"), vals.alias("v")))


def array_join_ws(arr: Column, sep: str = "、") -> Column:
    return F.array_join(arr, sep)


def explode_map_kv(df, map_col: str, key_name: str = "k", val_name: str = "v"):
    """map column -> (k, v) rows; the oracle-friendly shape for
    map-valued results (SURVEY.md §7 risk register)."""
    return df.select(
        *[c for c in df.columns if c != map_col],
        F.explode(F.col(map_col)).alias(key_name, val_name),
    )

"""Batch CDC merge: key-based upsert of an updates relation into a base
relation (the daily-increment pattern the reference runs as file appends —
gridmet_etl/etl.py incremental current-year handling — generalized to
arbitrary keyed updates).

Scale shape: the surviving-base side is a LEFT ANTI join on the key. When
updates are a daily increment (tiny vs base) the anti join broadcasts and
the base never shuffles; set ``broadcast_updates=False`` for same-magnitude
merges where a shuffled anti join is correct. Upsert-into-partitioned-
parquet at scale should pair this with dynamic partition overwrite so only
touched partitions rewrite (see streaming/events.py sink for the pattern).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_by_key(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Rows from ``updates`` win on key collision; base rows without a
    colliding key survive; update-only keys insert. Columns follow base's
    order (updates must carry the same schema)."""
    keys = list(keys)
    upd = updates.select(*base.columns)
    probe = F.broadcast(upd) if broadcast_updates else upd
    survivors = base.join(probe.select(*keys), keys, "left_anti")
    return survivors.unionByName(upd)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Key-level diff of two snapshots of the same relation — the audit
    step between CDC applications (upsert_by_key produces ``new``; this
    reports what changed): each key is classed ``added`` / ``removed`` /
    ``changed`` (any compare column differs, NULL-safe) — unchanged keys
    are dropped.

    One full outer join on the key: the single shuffle both relations
    need anyway, comparisons are codegen. NULL-safe equality (``<=>``)
    keeps NULL→value transitions visible.

    Output: (keys…, change) for changed keys only.
    """
    keys = list(keys)
    cmp_cols = [c for c in (compare_cols or old.columns) if c not in keys]
    o = old.select(*keys, F.struct(*cmp_cols).alias("_o"), F.lit(1).alias("_lo"))
    n = new.select(*keys, F.struct(*cmp_cols).alias("_n"), F.lit(1).alias("_rn"))
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_lo").isNull(), F.lit("added"))
        .when(F.col("_rn").isNull(), F.lit("removed"))
        .when(~F.col("_o").eqNullSafe(F.col("_n")), F.lit("changed"))
    )
    return joined.select(*keys, change.alias("change")).where(F.col("change").isNotNull())

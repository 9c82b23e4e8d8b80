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

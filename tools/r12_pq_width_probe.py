#!/usr/bin/env python
"""VERDICT r11 item 8: demonstrate (or refute) the pq mapInArrow claim at
production vector width.

The r11 rewrite moved pq_encode/pq_refine kernels from mapInPandas
(per-row ``np.array(list(series))`` objects) to mapInArrow (contiguous
values-buffer reshape). At the fixture's 64 dims the local A/B was a wash
(socket transfer of the same bytes dominates); the claim was that the
Arrow path wins at production dims because the per-row-object path scales
with rows x dims in PYTHON OBJECT work while the Arrow path scales with
bytes only.

This probe times BOTH kernel input paths over the same synthetic corpus at
--dim (default 512), same session, alternating reps (paired protocol per
the r11 box-noise memory): build a corpus of n vectors, run the encode
kernel via (a) the committed mapInArrow path and (b) a local mapInPandas
replica of the r10 kernel, and print best-of-N for each.

Usage: python tools/r12_pq_width_probe.py [--dim 512] [--n 100000] [--reps 3]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    dim = 512
    n = 100_000
    reps = 3
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--dim":
            dim, i = int(args[i + 1]), i + 2
        elif args[i] == "--n":
            n, i = int(args[i + 1]), i + 2
        elif args[i] == "--reps":
            reps, i = int(args[i + 1]), i + 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.pq import (
        _codes_matrix,
        pq_encode,
        pq_seed_codebooks,
    )
    from gridmet_etl_spark.session import get_spark

    spark = get_spark(app_name="r12_pq_width_probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    m, ksub = 8, 16
    dsub = dim // m
    vecs = spark.range(0, n, 1, 32).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), d -> "
            "cast(pmod(id * (d + 7) * 2654435761, 1000) as double) / 1000.0 - 0.5)"
        ).alias("embedding"),
    )
    books = pq_seed_codebooks(vecs, m=m, ksub=ksub, dim=dim)

    def _encode_pandas_r10(corpus):
        """The r10 mapInPandas kernel, reproduced verbatim for the A/B."""
        import numpy as np
        import pandas as pd

        names = ["vec_id"] + [f"code_{s}" for s in range(m)]

        def _fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(list(pdf["embedding"]), dtype=np.float64)
                codes = _codes_matrix(X, books)
                out = {"vec_id": pdf["vec_id"].to_numpy()}
                for s in range(m):
                    out[f"code_{s}"] = codes[:, s].astype(np.int32)
                yield pd.DataFrame(out, columns=names)

        schema = ", ".join(
            ["vec_id bigint"] + [f"code_{s} int" for s in range(m)]
        )
        return corpus.select("vec_id", "embedding").mapInPandas(_fn, schema)

    # alternate the variants so episodic box noise hits both; first pair
    # of calls doubles as the warm-up (best-of-N over later pairs)
    pq_encode(vecs, books).write.format("noop").mode("overwrite").save()
    _encode_pandas_r10(vecs).write.format("noop").mode("overwrite").save()
    arrow_best, pandas_best = float("inf"), float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        pq_encode(vecs, books).write.format("noop").mode("overwrite").save()
        arrow_best = min(arrow_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _encode_pandas_r10(vecs).write.format("noop").mode("overwrite").save()
        pandas_best = min(pandas_best, time.perf_counter() - t0)
    # identical outputs check (sorted hash of codes)
    a = pq_encode(vecs, books).orderBy("vec_id").limit(1000).collect()
    b = _encode_pandas_r10(vecs).orderBy("vec_id").limit(1000).collect()
    same = a == b
    print(
        f"dim={dim} n={n} reps={reps} "
        f"mapInArrow_best={arrow_best:.3f}s mapInPandas_best={pandas_best:.3f}s "
        f"ratio={pandas_best / arrow_best:.2f}x outputs_match={same}"
    )


if __name__ == "__main__":
    main()

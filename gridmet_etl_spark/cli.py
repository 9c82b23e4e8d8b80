"""CLI parity with the reference (SURVEY §3.1/3.2; cli.py:27-239).

Commands:
  gridmet-etl  — historical daily ETL: grid × weights → per-HRU daily series
  cfsv2-etl    — forecast ensembles: method 1 (median) or 2 (all members)
  check-fresh  — T1 availability gate (exit 1 when source data is stale)
  corpus-etl   — training-corpus hygiene/export: clean → dedup → decontaminate
                 → split → token-budget shards (extension surface)

Argument surface mirrors the reference's flags (--start-date/--end-date
validated as %Y-%m-%d, --fid, --partial → masked_mean, --fill-missing,
--method 1|2); inputs are the engine's parquet tables instead of
OPeNDAP/shapefiles (see sources.ingest for the remote boundary).

Run: ``python -m gridmet_etl_spark.cli gridmet-etl --help``
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime


def valid_date(value: str) -> str:
    """%Y-%m-%d validation (cli.py:14-19)."""
    try:
        datetime.strptime(value, "%Y-%m-%d")
    except ValueError:
        raise argparse.ArgumentTypeError(f"not a YYYY-MM-DD date: {value!r}") from None
    return value


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gridmet-etl-spark")
    sub = p.add_subparsers(dest="command", required=True)

    g = sub.add_parser("gridmet-etl", help="historical daily gridMET ETL")
    g.add_argument("--grid", required=True, help="long-form grid parquet")
    g.add_argument("--weights", required=True, help="weights parquet or csv")
    g.add_argument("--features", help="features parquet (enables bbox + fill)")
    g.add_argument("--start-date", type=valid_date)
    g.add_argument("--end-date", type=valid_date)
    g.add_argument("--fid", default="feature_id", help="feature id column name")
    g.add_argument("--partial", action="store_true", help="masked_mean for partial coverage")
    g.add_argument("--fill-missing", action="store_true")
    g.add_argument("--bug-compat-humidity", action="store_true",
                   help="reproduce the reference's literal rhmin + rhmax/2 (etl.py:740)")
    g.add_argument("--out", required=True)
    g.add_argument("--prefix", default="converted")

    c = sub.add_parser("cfsv2-etl", help="CFSv2 forecast ensemble ETL")
    c.add_argument("--grid-ens", required=True)
    c.add_argument("--weights", required=True)
    c.add_argument("--elevation", required=True, help="elevation parquet or PRMS param file")
    c.add_argument("--features")
    c.add_argument("--start-date", type=valid_date)
    c.add_argument("--end-date", type=valid_date)
    c.add_argument("--method", type=int, choices=[1, 2], default=1,
                   help="1=ensemble median, 2=all 48 members")
    c.add_argument("--fill-missing", action="store_true")
    c.add_argument("--run-date", type=valid_date,
                   help="forecast cycle date; output lands under run_date=<d>/ (T3)")
    c.add_argument("--out", required=True)
    c.add_argument("--prefix", default="converted")

    f = sub.add_parser("check-fresh", help="THREDDS freshness gate (T1)")
    f.add_argument("--base-url", required=True)
    f.add_argument("--datasets", nargs="*")

    k = sub.add_parser(
        "corpus-etl",
        help="training-corpus ETL: clean → dedup → decontaminate → split → shard",
    )
    k.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    k.add_argument("--benchmark", help="benchmark/eval parquet to decontaminate against")
    k.add_argument("--budget", type=int, default=1_000_000, help="tokens per train shard")
    k.add_argument("--train", type=float, default=0.9)
    k.add_argument("--val", type=float, default=0.05)
    k.add_argument("--test", type=float, default=0.05)
    k.add_argument("--out", required=True, help="manifest output dir (partitioned by split)")
    return p


def _load_weights(spark, path: str, fid: str = "feature_id"):
    from .sources.readers import read_weights_csv, read_weights_parquet

    if path.endswith(".csv"):
        return read_weights_csv(spark, path, fid)
    return read_weights_parquet(spark, path)


def _load_elevation(spark, path: str):
    if path.endswith(".param"):
        from .sources.prms import elevation_dataframe

        return elevation_dataframe(spark, path)
    return spark.read.parquet(path)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.command == "check-fresh":
        from .sources.thredds import check_freshness

        status = check_freshness(args.base_url, args.datasets or None)
        for ds, fresh in status.items():
            print(f"{'FRESH' if fresh else 'STALE'} {ds}")
        return 0 if all(status.values()) else 1

    from .session import get_spark
    from .sources.readers import convert_features, read_features, read_grid
    from .sources.writers import write_fill_map_csv, write_output

    spark = get_spark(app_name=f"gridmet_etl_spark_{args.command}")

    def _features(path: str | None, fid: str = "feature_id"):
        if not path:
            return None
        # reference dispatch (etl.py:549-568): GIS formats convert at ingest
        return read_features(spark, convert_features(path, fid_col=fid), fid)

    if args.command == "gridmet-etl":
        from .plans.gridmet import gridmet_pipeline

        grid = read_grid(spark, args.grid)
        weights = _load_weights(spark, args.weights, args.fid)
        features = _features(args.features, args.fid)
        if args.fill_missing and features is None:
            print("--fill-missing requires --features", file=sys.stderr)
            return 2
        out = gridmet_pipeline(
            grid,
            weights,
            features=features,
            start_date=args.start_date,
            end_date=args.end_date,
            partial=args.partial,
            fill=args.fill_missing,
            bug_compat_humidity=args.bug_compat_humidity,
        )
        path = write_output(out, args.out, file_prefix=args.prefix)
        print(f"wrote {path}")
        return 0

    if args.command == "cfsv2-etl":
        from .operators.fill import fill_missing as fill_op
        from .plans.cfsv2 import cfsv2_ensemble_pipeline, cfsv2_median_pipeline

        grid_ens = read_grid(spark, args.grid_ens)
        weights = _load_weights(spark, args.weights)
        elevation = _load_elevation(spark, args.elevation)
        features = _features(args.features)
        common = dict(
            features=features, start_date=args.start_date, end_date=args.end_date
        )
        if args.method == 1:
            out = cfsv2_median_pipeline(grid_ens, weights, elevation, **common)
            prefix = f"{args.prefix}_median"
            partition_by: tuple[str, ...] = ()
        else:
            out = cfsv2_ensemble_pipeline(grid_ens, weights, elevation, **common)
            prefix = f"{args.prefix}_ensemble"
            partition_by = ("ens",)  # per-member layout (K4's _N suffix)
        if args.fill_missing:
            if features is None:
                print("--fill-missing requires --features", file=sys.stderr)
                return 2
            out, fmap = fill_op(out, features)
            write_fill_map_csv(fmap, args.out)
            prefix = f"filled_{prefix}"
        if args.run_date:
            # T3: each forecast cycle is a self-contained snapshot partition
            from pyspark.sql import functions as SF

            out = out.withColumn("run_date", SF.lit(args.run_date))
            partition_by = ("run_date", *partition_by)
        from .sources.writers import CFSV2_CALENDAR

        path = write_output(
            out, args.out, partition_by=partition_by, file_prefix=prefix,
            calendar=CFSV2_CALENDAR,  # cfsv2_median_header.md:43
        )
        print(f"wrote {path}")
        return 0

    if args.command == "corpus-etl":
        from .plans.corpus import corpus_pipeline

        docs = spark.read.parquet(args.docs)
        bench = (
            spark.read.parquet(args.benchmark)
            if args.benchmark
            else spark.createDataFrame([], "doc_id long, text string")
        )
        weights = {"train": args.train, "val": args.val, "test": args.test}
        manifest = corpus_pipeline(docs, bench, budget=args.budget, weights=weights)
        manifest.write.mode("overwrite").partitionBy("split").parquet(args.out)
        print(f"wrote {args.out}")
        return 0

    return 2  # pragma: no cover


if __name__ == "__main__":
    sys.exit(main())

"""CLI entry point — the engine's replacement for the reference's
``main_handler`` + systemd timer (``src/parser.py:86-102``,
``systemd/jhu-data-parser.service:7``).

Usage (paths may be local files, file:// or https:// URLs):

    python -m jhu_data_parser_spark category \
        --source confirmed=<csv> [--source deaths=<csv> ...] \
        --lookup <csv> --out <dir>

    python -m jhu_data_parser_spark combined \
        --confirmed <csv> --deaths <csv> --recovered <csv> \
        --lookup <csv> --out <dir>

A scheduler (cron/systemd/airflow) reruns this daily exactly like the
reference's timer; unlike the reference, the write is one distributed
job, not one HTTPS PUT per record.
"""

from __future__ import annotations

import argparse
import logging
import sys


def _parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser(prog="jhu_data_parser_spark")
    sub = ap.add_subparsers(dest="mode", required=True)

    cat = sub.add_parser("category", help="per-category partitioned lake (parser.py parity)")
    cat.add_argument(
        "--source",
        action="append",
        required=True,
        metavar="NAME=PATH",
        help="category name and CSV path/URL; repeatable",
    )
    cat.add_argument("--lookup", required=True)
    cat.add_argument("--out", required=True)

    com = sub.add_parser("combined", help="combined flat lake (parser2.py parity)")
    com.add_argument("--confirmed", required=True)
    com.add_argument("--deaths", required=True)
    com.add_argument("--recovered", required=True)
    com.add_argument("--lookup", required=True)
    com.add_argument("--out", required=True)
    return ap.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    args = _parse_args(argv if argv is not None else sys.argv[1:])

    from jhu_data_parser_spark.session import get_spark

    spark = get_spark(app_name=f"jdps-etl-{args.mode}")
    if args.mode == "category":
        from jhu_data_parser_spark.etl import category_pipeline

        sources = dict(s.split("=", 1) for s in args.source)
        df = category_pipeline(spark, sources, args.lookup, args.out)
        logging.info("category pipeline wrote %d records to %s", df.count(), args.out)
    else:
        from jhu_data_parser_spark.etl import combined_pipeline

        df = combined_pipeline(
            spark, args.confirmed, args.deaths, args.recovered, args.lookup, args.out
        )
        logging.info("combined pipeline wrote %d records to %s", df.count(), args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

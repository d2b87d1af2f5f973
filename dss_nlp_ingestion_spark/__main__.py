"""CLI front door: run any registered query against a scale-factor
directory.

    python -m dss_nlp_ingestion_spark --list
    python -m dss_nlp_ingestion_spark q1_pricing_summary
    python -m dss_nlp_ingestion_spark flagship_doc_profile \
        --sf-dir /root/testdata/sf0.01 --explain --limit 20
"""

from __future__ import annotations

import argparse
import sys

from dss_nlp_ingestion_spark.catalog import DEFAULT_SF_DIR
from dss_nlp_ingestion_spark.plans import ORACLES, QUERIES
from dss_nlp_ingestion_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dss_nlp_ingestion_spark")
    ap.add_argument("query", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the formatted plan")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args(argv)

    if args.list or not args.query:
        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}  [{kind}]")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"dss-cli:{args.query}")
    spark.sparkContext.setLogLevel("WARN")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    print(f"-- {df.count()} rows total (showing up to {args.limit})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Dump the physical plan of any catalog query.

    python tools/explain.py q_region_revenue [q_tfidf_topdocs ...]
    python tools/explain.py --sf /root/testdata/sf0.1 q_curation_pipeline

Prints `explain("formatted")` output — scan ReadSchema / PushedFilters,
join strategies, exchanges, WholeStageCodegen spans — the things
PLANS.md audits. No arguments: lists available query names.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_tool_bakasura__spark.plans.catalog import QUERIES  # noqa: E402
from data_ingestion_tool_bakasura__spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*", help="catalog query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="fixture dir")
    args = ap.parse_args()

    if not args.queries:
        print("\n".join(sorted(QUERIES)))
        return

    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        ap.error(f"unknown queries: {unknown} (run with no args to list)")

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        QUERIES[name](spark, args.sf).explain("formatted")


if __name__ == "__main__":
    main()

"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB at the
given scale dir, canonicalizes both results (columns sorted by name,
rows sorted, doubles rounded to 6 decimals, timestamps -> UTC ISO) and
compares row-count + values. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else round(float(v), 6))
        elif s.dtype == object:
            df[c] = s.map(lambda v: round(float(v), 6) if isinstance(v, float) else v)
    rows = [tuple(None if (isinstance(x, float) and math.isnan(x)) else x for x in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    names = [a for a in sys.argv[1:] if "/" not in a]

    sys.path.insert(0, "/root/repo")
    from data_ingestion_tool_bakasura__spark.plans.catalog import ORACLE, QUERIES
    from data_ingestion_tool_bakasura__spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    from data_ingestion_tool_bakasura__spark.sources.readers import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    targets = names or list(QUERIES)
    n_pass = n_fail = 0
    for name in targets:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in ORACLE:
            print(f"ok~  {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(ORACLE[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        # Driver-hash parity: the driver hashes values dtype-sensitively,
        # so int64 8 vs float64 8.0 (DuckDB HUGEINT fetched as float)
        # mismatches even though Python == treats them equal. Flag any
        # numeric-kind drift per column (i/u vs f) loudly.
        kinds = {}
        for c in sorted(set(sdf.columns) & set(odf.columns)):
            ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
            norm = lambda k: "i" if k in "iu" else k
            if norm(ks) != norm(ko):
                kinds[c] = (str(sdf[c].dtype), str(odf[c].dtype))
        if kinds:
            print(f"WARN {name}: dtype drift (spark vs duckdb): {kinds}")
        cs, co = canon(sdf), canon(odf)
        if len(cs) != len(co):
            print(f"FAIL {name}: row count spark={len(cs)} duckdb={len(co)}")
            n_fail += 1
        elif cs != co:
            diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
            if sorted(sdf.columns) != sorted(odf.columns):
                print(f"     cols spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
            n_fail += 1
        else:
            # 0 == 0 is a vacuous match — loudly flag it so a query whose
            # filter silently selects nothing can't hide behind a PASS
            empty = " [WARN: EMPTY RESULT — vacuous match]" if not cs else ""
            print(f"PASS {name} ({len(cs)} rows, {t_spark:.1f}s){empty}")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

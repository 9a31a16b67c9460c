"""Whole-catalog physical-plan audit for scale anti-patterns.

PLANS.md audits flagship queries by hand; this sweeps EVERY batch
query in the catalog, walking the (pre-execution, AQE initial)
physical plan tree via py4j, and flags:

- ``CartesianProduct`` — two unbounded sides crossed (broadcast
  nested-loop joins are fine and common: 1-row normalizers, tiny
  query sets);
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan
  (Arrow/pandas evals are the sanctioned Python path);
- a ``SinglePartition`` exchange whose PARENT is not a global
  aggregate. The final exchange of ``df.agg(...)`` is SinglePartition
  by definition and carries one partial row per map task — fine; a
  SinglePartition exchange feeding a Sort/Window funnels the whole
  input through one task, which is only acceptable over
  dimension-bounded aggregates (the PLANS.md "Whole-frame windows"
  pattern) — those queries are allowlisted explicitly.

Streaming queries are skipped (their plans materialize through the
replay/foreachBatch harnesses, audited by their own tests). Queries
whose CONSTRUCTION runs jobs (kmeans fits, collected query sets,
stream replays) run those jobs here — the audit is read-only but not
free (~2 min at sf0.01).

Usage: ``python tools/plan_audit.py [sf_dir] [name ...]``; exits 1 on
any unallowed finding.
"""

from __future__ import annotations

import sys

#: Global aggregates: a SinglePartition exchange directly under one of
#: these is the standard partial->final scalar aggregation.
_AGG_PARENTS = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}

#: Queries whose plan legitimately funnels through one task: every
#: entry is a whole-frame window/sort over an aggregate bounded by a
#: dimension (suppliers, months, stages, buckets), never fact data —
#: see PLANS.md "Whole-frame windows over aggregates". q_rank_dense_ntile
#: is the documented exception (a deliberately global ranking demo,
#: PLANS.md "global total-order window").
SINGLE_PARTITION_OK = {
    "q_top_revenue_supplier",      # max() over per-supplier aggregate
    "q_top_shippers",              # avg() over per-supplier aggregate (Q20 shape)
    "q_market_share",              # share-of-total over per-nation agg
    "q_part_value_concentration",  # cumulative share over per-part agg
    "q_revenue_forecast",          # lag window over per-month aggregate
    "q_order_count_distribution",  # histogram over per-count aggregate
    "q_user_retention",            # cohort matrix over per-user aggregate
    "q_funnel_conversion",         # ordered funnel over per-stage agg
    "q_rank_dense_ntile",          # documented global ranking window
    "q_stream_funnel",             # batch post-processing of a bounded replay
    "q_source_mixture",            # water-filling over per-source aggregate
    "q_temperature_mixture",       # n^alpha shares over per-source aggregate
    "q_hybrid_rrf",                # RRF fuse of two top-k lists (k rows)
    "q_tfidf_topdocs",             # rank over per-(doc,term) aggregate
    "q_bm25_topdocs",              # rank over per-doc score aggregate
    "q_small_quantity_revenue",    # 1-row correlated aggregate result
}


def _walk(node, visit):
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        _walk(node.initialPlan(), visit)
        return
    n = node.children().size()
    for i in range(n):
        child = node.children().apply(i)
        visit(name, child)
        _walk(child, visit)


def audit_plan(df) -> list[str]:
    root = df._jdf.queryExecution().executedPlan()
    found: list[str] = []

    def visit(parent_name: str, node) -> None:
        name = node.nodeName()
        if name == "CartesianProduct":
            found.append("CartesianProduct")
        elif name == "BatchEvalPython":
            found.append("BatchEvalPython (row-at-a-time Python UDF)")
        elif (
            name == "Exchange"
            and node.outputPartitioning().toString() == "SinglePartition"
            and parent_name not in _AGG_PARENTS
        ):
            found.append(f"SinglePartition exchange under {parent_name}")

    visit("<root>", root)
    _walk(root, visit)
    return found


def main() -> int:
    args = sys.argv[1:]
    sf = next((a for a in args if "/" in a), "/root/testdata/sf0.01")
    only = [a for a in args if "/" not in a]

    sys.path.insert(0, "/root/repo")
    from data_ingestion_tool_bakasura__spark.plans.catalog import QUERIES
    from data_ingestion_tool_bakasura__spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    n_checked = n_skipped = 0
    findings: list[tuple[str, str]] = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
        except Exception as exc:  # noqa: BLE001 — surface, keep sweeping
            findings.append((name, f"construction failed: {exc}"))
            continue
        if df.isStreaming:
            n_skipped += 1
            continue
        n_checked += 1
        for what in audit_plan(df):
            if what.startswith("SinglePartition") and name in SINGLE_PARTITION_OK:
                continue
            findings.append((name, what))

    print(f"checked {n_checked} batch plans, skipped {n_skipped} streaming")
    if findings:
        print("findings:")
        for name, what in findings:
            print(f"  {name}: {what}")
        return 1
    print("no scale anti-patterns outside the documented allowlist")
    return 0


if __name__ == "__main__":
    sys.exit(main())

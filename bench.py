"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE compact JSON line on stdout:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Truncation-proofing (VERDICT r7 #2): the round driver records only the
last 2000 characters of stdout, and the r7 verbose single-line JSON
(~3.5 KB with ``query_load1``) lost its head to that window — the
per-query evidence survived but ``metric``/``value`` and half the times
did not parse. Now stdout carries exactly ONE compact line (2-decimal
times, no intra-token spaces, sized to fit a 2000-char tail capture;
``load_start``/``load_end`` are dropped first if a grown suite ever
pushes it over ~1900 chars), while the full verbose payload
(3-decimal times, per-query 1-min loadavg) goes ONLY to
``BENCH_detail_last.json`` next to this file
(``$SPARK_GRAFT_BENCH_DETAIL`` overrides the path;
``SPARK_GRAFT_BENCH_VERBOSE=1`` additionally echoes it to stderr —
off by default so the driver's tail capture holds exactly one JSON
payload, r8 verdict #7).

Each query is executed to completion via the `noop` sink (count() would
let Catalyst prune expensive projected columns that nothing aggregates
over, under-measuring e.g. embedding columns); per-query wall time is
recorded after a session warm-up.

Per-query failures are isolated: a failing query records
``{"err": ...}`` under its name and the JSON line still emits. When
``n_err > 0`` the headline ``value`` sums the SUCCESSFUL queries only —
it is comparable across runs only when ``n_err == 0``; consumers must
check ``n_err`` (equivalently ``partial``) before reading ``value`` as
a suite total (ADVICE r5).

Host-load self-identification (VERDICT r6 #6): contention adjudication
used to be manual cross-run forensics. The JSON now carries
``load_start``/``load_end`` (3-tuple ``os.getloadavg()`` around the
suite) and ``query_load1`` (the 1-min loadavg sampled at each query's
START — the boundary sample doubles as the previous query's end). On
this local[32] host the bench's own steady-state footprint keeps load1
in the low tens; a ``load_start`` well above ~8 before the warm-up, or
query_load1 values far above ``32 + load_start``, mark the run as
contended per BASELINE.md's exclusion rule (uniform ≳1.3x median
per-query ratio).

Since r18 (VERDICT r17 #4) the line additionally carries
``adjudication`` (SETTLED/ELEVATED/CONTENDED per
``tools/adjudicate_bench.py``'s median-ratio rule), ``median_ratio``
and ``adj_ref`` (the newest committed ``BENCH_local_r*.json`` it was
computed against) — machine-readable host-shift-vs-code-shift for the
driver's PERF comparison; ``NO-REF`` when no reference run exists.
Additive fields only; the timed region and every prior field are
unchanged, so totals stay comparable across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_tool_bakasura__spark.plans.catalog import QUERIES  # noqa: E402
from data_ingestion_tool_bakasura__spark.session import get_spark  # noqa: E402

#: Headline suite: one per operator family, the shapes that matter at scale.
HEADLINE = [
    "q_pricing_summary",       # scan + full agg
    "q_region_revenue",        # 6-way join w/ broadcast dims
    "q_shipping_priority",     # join + agg + top-k
    "q_top3_orders_per_customer",  # grouped window top-k
    "q_rollup_returns",        # rollup agg
    "q_ship_within_30d",       # equi+range join
    "q_asof_click_error",      # as-of join (union+window)
    "q_tumbling_hourly",       # time-window agg
    "q_session_windows",       # session windows
    "q_exact_dedup",           # hash dedup
    "q_minhash_lsh_candidates",  # MinHash LSH near-dup
    "q_token_stats",           # text analysis scan
    "q_cosine_topk_batch",     # brute-force vector top-k (batched)
    "q_lsh_ann_topk",          # ANN vector top-k
    "q_ingest_pipeline",       # full ingest (chunk+dedup+embed)
    "q_simhash_bands",         # 64-bit SimHash signatures
    "q_doc_assembly",          # binary -> pages -> OCR gate -> assembly
    "q_stream_tumbling_hourly",  # real Structured Streaming replay
    "q_value_zscore_builtin",  # windowed z-score (production path; the
                               # applyInPandas twin stays as the catalog's
                               # C18 grouped-map gate — PLANS.md hot spots)
    "q_dedup_clusters",        # connected components over LSH pairs
    "q_tfidf_topdocs",         # TF-IDF ranked search
    "q_corpus_filter",         # composed pre-training corpus gate
    "q_small_quantity_revenue",  # correlated aggregate (Q17 shape)
    "q_curation_pipeline",     # filter -> dedup -> decontaminate -> split
    "q_token_budget",          # distributed two-phase prefix sum
    "q_bm25_topdocs",          # one-scan Okapi BM25
    "q_hybrid_rrf",            # BM25 + vector-cosine RRF fusion
    "q_volume_shipping",       # Q7 bilateral nation-flow join chain
    "q_incremental_dedup",     # increment probed vs persisted LSH index
    "q_ivf_search",            # IVF probe-side vector search
    "q_ivf_kmeans_search",     # IVF fit: maxmin init + Lloyd iterations
    "q_source_mixture",        # corpus mixture water-filling (in-plan)
    "q_stream_funnel",         # streaming stateful funnel
    "q_repeated_spans",        # intra-doc repeated n-gram spans
    "q_stream_near_dedup",     # streaming near-dedup over band index
    "q_pii_redaction",         # regexp-cascade PII scrub (map-only)
    "q_sequence_packing",      # concat-and-cut shards (2-phase prefix sum)
    "q_embedding_quantize",    # int8 max-abs vector quantization
    "q_quantized_rerank",      # int8 candidate scan + exact rerank
    "q_winnow_fingerprints",   # winnowing sketch (sliding-window min)
    "q_pq_rerank",             # PQ codes + ADC scan + exact rerank
    "q_ivfadc_search",         # IVF x PQ composition (billion-scale layout)
    "q_paragraph_dedup",       # sub-document dedup + canonical reassembly
    "q_substring_dedup",       # repeated-span surgery (Lee et al. shape)
    "q_semantic_dedup",        # SemDeDup per-cluster GEMM prune
    "q_lm_quality",            # char-trigram LM perplexity filter
    "q_quality_classifier",    # CCNet-shape logistic quality filter
    "q_image_near_dup",        # banded aHash image near-dup (C15 x C13)
    "q_url_dedup",             # r10: URL normalize + one-exchange dedup (C20)
    "q_dsir_weights",          # r10: DSIR importance weights (C19)
    "q_wet_pipeline",          # r11: WET source -> dedup -> cap -> rollup (C1/C20)
    "q_lang_id_trigram",       # r11: char-trigram profile lang-id (C16)
    "q_gopher_quality",        # r11: Gopher quality rules, map-only (C20)
    "q_web_quality_pipeline",  # r11: C4 clean -> Gopher gate composition (C20)
    "q_gopher_repetition",     # r11: Table A1 repetition signals (C20)
    "q_video_near_dup",        # r11: shot-fingerprint video dedup (C15)
    "q_main_content",          # r11: jusText boilerplate removal (C20)
    "q_pagerank",              # r11: WAT link graph -> fixed-sweep PageRank (C20)
    "q_warc_render",           # r12: WARC write-side record render (C2)
    "q_binary_rerank",         # r12: 1-bit Hamming shortlist + exact rerank (C14)
    # r15 (r14 verdict #2): pin perf for the r11-r14 heavy additions
    # that had correctness evidence but no bench number — a regression
    # in the 1,200-line PDF scanner, the CDX range-fetch path, or the
    # zstd member codec was invisible to the bench gate before these.
    "q_page_extract",          # r15: binary -> per-page extraction rows (A4-A10)
    "q_cdx_range_fetch",       # r15: CDX plan -> byte-range WARC fetch (C1)
    "q_warc_zst_roundtrip",    # r15: .warc.zst write + member-decode read (C1/C2)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bakasura-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        # noop sink: full computation of every output column, no I/O
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM + parquet footer caches, not measured
    try:
        materialize(QUERIES["q_top_orders"](spark, sf_dir))
    except Exception as exc:  # noqa: BLE001 — warm-up is best-effort
        print(f"bench: warm-up failed: {exc}", file=sys.stderr)

    # Shape warm-up (r12 verdict #3): the suite runs each query once,
    # so a query whose plan shape appears nowhere else carries its
    # one-off per-process whole-stage-codegen/JIT first-touch inside
    # its measured number — q_lang_id_trigram grazed band-hi two
    # rounds running on exactly this (standalone warm probes sit
    # squarely in band), and q_ivfadc_search joined it in r12/r13
    # (5.21/5.54 raw vs hi 5.0; with the shape warm-up it probes
    # 4.3-4.7 even on a loaded host). Running the SAME plan shape at
    # the smoke scale first (unmeasured) warms the generated-code
    # caches while leaving the sf-scale work itself fully measured.
    # Only queries with a documented first-touch graze are listed —
    # warming everything would just move the suite's honest cold
    # component off the books wholesale.
    smoke_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(smoke_dir):
        for wname in ("q_lang_id_trigram", "q_ivfadc_search"):
            try:
                materialize(QUERIES[wname](spark, smoke_dir))
            except Exception as exc:  # noqa: BLE001 — best-effort
                print(f"bench: shape warm-up {wname} failed: {exc}",
                      file=sys.stderr)

    def load_now() -> list[float]:
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:  # platform without getloadavg
            return [-1.0, -1.0, -1.0]

    load_start = load_now()
    # Per-query error isolation: one broken query must not zero out the
    # whole suite's numbers — record its error and keep measuring.
    times: dict[str, float | dict[str, str]] = {}
    query_load1: dict[str, float] = {}
    n_ok = 0
    for name in HEADLINE:
        query_load1[name] = load_now()[0]
        t0 = time.time()
        try:
            materialize(QUERIES[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — isolate, record, continue
            times[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            continue
        times[name] = round(time.time() - t0, 3)
        n_ok += 1

    total = round(sum(t for t in times.values() if isinstance(t, float)), 3)
    # Self-adjudication (r17 verdict #4): the settled-vs-contended call
    # used to need post-hoc forensics against the committed settled
    # window; the already-computed median per-query ratio now rides the
    # JSON line so a PERF comparison can separate host shift from code
    # shift mechanically. ADDITIVE only — the timed region, the metric
    # and every existing field are untouched; failures degrade to
    # "NO-REF" rather than ever breaking the bench.
    adj: dict[str, object] = {"adjudication": "NO-REF"}
    try:
        from tools.adjudicate_bench import (
            _payload,
            contention_verdict,
            newest_local_bench,
            ratios,
        )

        repo = os.path.dirname(os.path.abspath(__file__))
        ref_path = newest_local_bench(repo)
        if ref_path:
            ref = _payload(json.load(open(ref_path)))
            ok_times = {n: t for n, t in times.items() if isinstance(t, float)}
            verdict, med = contention_verdict(ratios({"queries": ok_times}, ref))
            if med == med:  # not NaN
                adj = {
                    "adjudication": verdict,
                    "median_ratio": round(med, 3),
                    "adj_ref": os.path.basename(ref_path),
                }
    except Exception as exc:  # noqa: BLE001 — advisory metadata only
        print(f"bench: self-adjudication skipped: {exc}", file=sys.stderr)
    detail = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "n_ok": n_ok,
        "n_err": len(HEADLINE) - n_ok,
        "partial": n_ok < len(HEADLINE),
        "load_start": load_start,
        "load_end": load_now(),
        "query_load1": query_load1,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **adj,
    }
    # Full verbose payload: sidecar file only (r8 verdict #7 — echoing it
    # to stderr interleaved a truncated fragment ahead of the parseable
    # stdout line in the driver's tail capture; opt back in with
    # SPARK_GRAFT_BENCH_VERBOSE=1 for interactive runs).
    if os.environ.get("SPARK_GRAFT_BENCH_VERBOSE"):
        print(json.dumps(detail), file=sys.stderr)
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_detail_last.json"),
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError as exc:
        print(f"bench: detail sidecar not written: {exc}", file=sys.stderr)

    # stdout: ONE compact line sized to survive a 2000-char tail capture.
    compact = dict(detail)
    compact["queries"] = {
        n: (round(t, 2) if isinstance(t, float) else {"err": t["err"][:80]})
        for n, t in times.items()
    }
    del compact["query_load1"]
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # grown suite: shed the load samples before the times
        del compact["load_start"], compact["load_end"]
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    sys.exit(0 if n_ok > 0 else 1)


if __name__ == "__main__":
    main()

"""End-to-end pipeline CLI — the reference's user journey as commands.

The reference is an interactive app: upload files -> extract pages ->
chunk -> embed -> upsert into a search index -> show stats
(``main.py:227-391``). This CLI is that journey over the Spark engine,
plus the search leg the reference configures but never issues:

    python tools/pipeline_cli.py ingest <src_dir> <index_dir> [--glob '*'] [--dim 64]
    python tools/pipeline_cli.py build-ann <index_dir> [--kind hnsw|ivf|pq|binary]
    python tools/pipeline_cli.py search <index_dir> "query text" [--mode text|vector|hybrid] [--index exact|hnsw|ivf|pq|binary] [-k 10]
    python tools/pipeline_cli.py stats <index_dir>

``ingest`` is incremental and dedup-checked (same batch twice adds 0
chunks — the reference's text_hash probe, done as one anti-join);
``search`` modes map to BM25 (B8), vector KNN (B9) and RRF-hybrid
(B10). ``build-ann`` persists an ANN artifact once, after which
``--index hnsw|ivf|pq|binary`` serves vector/hybrid queries from the stored
structure instead of scanning the corpus — the reference's
serve-from-HNSW-index shape (db_utils.py:93-110). Output is JSON
lines on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pipeline_cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="extract -> chunk -> embed -> index")
    p_ing.add_argument("src_dir")
    p_ing.add_argument("index_dir")
    p_ing.add_argument("--glob", default=None, help="e.g. '*.txt'")
    p_ing.add_argument("--dim", type=int, default=64, help="embedding dim")

    p_crw = sub.add_parser(
        "crawl", help="WARC archives -> curated pages -> chunk -> embed -> index"
    )
    p_crw.add_argument("warc_dir")
    p_crw.add_argument("index_dir")
    p_crw.add_argument("--glob", default="*.warc*")
    p_crw.add_argument("--dim", type=int, default=64, help="embedding dim")
    p_crw.add_argument(
        "--max-per-domain", type=int, default=0,
        help="cap pages per registrable domain (0 = uncapped)",
    )
    p_crw.add_argument(
        "--block-domains", default=None,
        help="comma-separated registrable domains to drop (subdomains included)",
    )
    p_crw.add_argument(
        "--quality-gate", default=None,
        help="'+'-combination of c4/gopher/rep page-quality rules",
    )
    p_crw.add_argument(
        "--langid-profiles", default=None,
        help="persisted fit_lang_profiles parquet for the language gate",
    )
    p_crw.add_argument(
        "--allowed-langs", default=None,
        help="comma-separated language guesses to keep (needs --langid-profiles)",
    )
    p_crw.add_argument(
        "--drop-und", action="store_true",
        help="strict language gate: also drop pages the classifier "
             "cannot call ('und'); default keeps them (crawl-friendly)",
    )
    p_crw.add_argument(
        "--boilerplate", action="store_true",
        help="jusText main-content extraction instead of flat html_to_text",
    )
    p_crw.add_argument(
        "--host-ranks", default=None,
        help="persisted linkgraph.pagerank parquet; host-quality prior gate",
    )
    p_crw.add_argument(
        "--min-host-rank", type=float, default=0.0,
        help="rank floor for --host-ranks (unranked hosts always pass)",
    )
    p_crw.add_argument(
        "--archive", default=None,
        help="also publish the kept raw responses as .warc.gz + .cdxj here",
    )

    p_rk = sub.add_parser(
        "build-ranks",
        help="WAT metadata -> host link graph (incremental) -> PageRank parquet",
    )
    p_rk.add_argument("wat_dir")
    p_rk.add_argument("graph_dir", help="persisted waved host-graph parquet")
    p_rk.add_argument("ranks_out", help="(node, rank) parquet for --host-ranks")
    p_rk.add_argument("--glob", default="*.wat*")
    p_rk.add_argument("--wave", required=True,
                      help="unique id for this crawl wave (replay guard)")
    p_rk.add_argument("--iterations", type=int, default=3)
    p_rk.add_argument(
        "--links-path", default="$.links",
        help="JSON path of the links array in the WAT envelope",
    )

    p_fr = sub.add_parser(
        "frontier",
        help="WAT links + landed corpus -> prioritized, slotted fetch list",
    )
    p_fr.add_argument("wat_dir")
    p_fr.add_argument("corpus_dir", help="parquet with a norm_url column")
    p_fr.add_argument("out_dir", help="frontier parquet (slot-ordered)")
    p_fr.add_argument("--glob", default="*.wat*")
    p_fr.add_argument("--max-per-domain", type=int, default=1000)
    p_fr.add_argument("--per-slot", type=int, default=1,
                      help="fetches per domain per politeness tick")
    p_fr.add_argument("--host-ranks", default=None,
                      help="pagerank parquet to annotate host_rank")
    p_fr.add_argument(
        "--links-path", default="$.links",
        help="JSON path of the links array in the WAT envelope",
    )
    p_fr.add_argument(
        "--robots", default=None,
        help="robots parquet (host, body): declared Crawl-delays stride"
             " each domain's slots by ceil(delay / --tick)",
    )
    p_fr.add_argument(
        "--tick", type=float, default=1.0,
        help="seconds per politeness slot (the fetcher's drain rate)",
    )

    p_ann = sub.add_parser("build-ann", help="persist an ANN serving artifact")
    p_ann.add_argument("index_dir")
    p_ann.add_argument("--kind", choices=("hnsw", "ivf", "pq", "binary"), default="hnsw")
    p_ann.add_argument(
        "--increment", action="store_true",
        help="fold rows ingested since the last build/increment into the "
             "existing artifact (touched shards/lists only) instead of rebuilding",
    )

    p_sea = sub.add_parser("search", help="query the index")
    p_sea.add_argument("index_dir")
    p_sea.add_argument("query")
    p_sea.add_argument("--mode", choices=("text", "vector", "hybrid"), default="hybrid")
    p_sea.add_argument(
        "--index", choices=("exact", "hnsw", "ivf", "pq", "binary"), default="exact",
        help="vector-leg retrieval path (non-exact needs build-ann first)",
    )
    p_sea.add_argument(
        "--rerank", action="store_true",
        help="hybrid only: semantic second-stage rerank of the fused top-N",
    )
    p_sea.add_argument("-k", type=int, default=10)

    p_sta = sub.add_parser("stats", help="index stats + per-file facet")
    p_sta.add_argument("index_dir")

    args = ap.parse_args(argv)

    from data_ingestion_tool_bakasura__spark.index_client import IndexClient
    from data_ingestion_tool_bakasura__spark.session import get_spark

    spark = get_spark("pipeline-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "ingest":
        from data_ingestion_tool_bakasura__spark.multimodal.extract import (
            auto_ocr,
            auto_parse_pages,
            extract_to_documents,
        )
        from data_ingestion_tool_bakasura__spark.operators.ingest import (
            IngestConfig,
            ingest_documents,
        )
        from data_ingestion_tool_bakasura__spark.sources.readers import read_binary_files

        client = IndexClient(spark, args.index_dir, embedding_dim=args.dim)
        client.initialize()
        raw = read_binary_files(spark, args.src_dir, glob=args.glob)
        docs = extract_to_documents(raw, parser=auto_parse_pages, ocr=auto_ocr)
        rows = ingest_documents(docs, cfg=IngestConfig(embedding_dim=args.dim))
        n_new = client.store(rows)
        print(json.dumps({"event": "ingested", "new_chunks": n_new, **client.stats()}))
        return 0

    if args.cmd == "build-ranks":
        from data_ingestion_tool_bakasura__spark.operators import (
            linkgraph as LG,
        )
        from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

        links = LG.extract_links(
            read_wat(spark, args.wat_dir, glob=args.glob),
            links_path=args.links_path,
        )
        n_new = LG.host_graph_increment(
            spark, args.graph_dir, links, args.wave
        )
        ranks = LG.pagerank(
            LG.load_host_graph(spark, args.graph_dir),
            weight_col="n_links", iterations=args.iterations,
        )
        ranks.write.mode("overwrite").parquet(args.ranks_out)
        out = spark.read.parquet(args.ranks_out)
        print(json.dumps({
            "event": "ranks_built", "wave": args.wave,
            "n_edges_appended": n_new, "n_hosts": out.count(),
            "out": args.ranks_out,
        }))
        return 0

    if args.cmd == "frontier":
        from data_ingestion_tool_bakasura__spark.operators import (
            linkgraph as LG,
        )
        from data_ingestion_tool_bakasura__spark.sources.warc import read_wat

        links = LG.extract_links(
            read_wat(spark, args.wat_dir, glob=args.glob),
            links_path=args.links_path,
        )
        corpus = spark.read.parquet(args.corpus_dir)
        ranks = (spark.read.parquet(args.host_ranks)
                 if args.host_ranks else None)
        delays = None
        if args.robots:
            from pyspark.sql import functions as F

            from data_ingestion_tool_bakasura__spark.functions import (
                urls as U,
            )
            from data_ingestion_tool_bakasura__spark.operators.crawl import (
                robots_delays_df,
            )

            # the frontier is registrable-domain keyed; robots tables
            # are host keyed (www.x.com) — fold hosts to domains and
            # keep the LONGEST declared delay per domain (conservative:
            # never fetch a domain faster than its strictest host asks)
            delays = (
                robots_delays_df(spark.read.parquet(args.robots))
                .select(
                    U.registrable_domain(F.col("host")).alias("host"),
                    "crawl_delay",
                )
                .groupBy("host")
                .agg(F.max("crawl_delay").alias("crawl_delay"))
            )
        sched = LG.fetch_schedule(
            LG.frontier_expand(
                links, corpus, max_per_domain=args.max_per_domain,
                host_ranks=ranks,
            ),
            per_slot=args.per_slot,
            delays=delays,
            tick_seconds=args.tick,
        )
        sched.write.mode("overwrite").parquet(args.out_dir)
        from pyspark.sql import functions as F

        out = spark.read.parquet(args.out_dir)
        print(json.dumps({
            "event": "frontier_built",
            "n_urls": out.count(),
            "n_domains": out.select("domain").distinct().count(),
            "n_slots": out.agg(F.max("slot")).first()[0],
            "out": args.out_dir,
        }))
        return 0

    if args.cmd == "crawl":
        from pyspark.sql import functions as F

        from data_ingestion_tool_bakasura__spark.functions.text import html_to_text_udf
        from data_ingestion_tool_bakasura__spark.operators import crawl as CR
        from data_ingestion_tool_bakasura__spark.operators.ingest import (
            IngestConfig,
            ingest_documents,
        )
        from data_ingestion_tool_bakasura__spark.sources.warc import (
            decode_payload_udf,
            read_warc,
        )

        client = IndexClient(spark, args.index_dir, embedding_dim=args.dim)
        client.initialize()
        pages = read_warc(spark, args.warc_dir, glob=args.glob).filter(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/")
            & (F.col("url") != "")
        )
        pages = CR.url_dedup(pages, "url", order_col="record_id")
        if args.block_domains:
            pages = CR.domain_blocklist_filter(
                pages, args.block_domains.split(","), "url"
            )
        if args.host_ranks:  # domain-level prior BEFORE decode cost
            pages = CR.host_rank_filter(
                pages, spark.read.parquet(args.host_ranks), "url",
                min_rank=args.min_host_rank,
            ).drop("host_rank")
        if args.max_per_domain > 0:
            pages = CR.domain_cap(
                pages, "url", max_per_domain=args.max_per_domain,
                order_col="record_id",
            )
        if args.archive:
            from data_ingestion_tool_bakasura__spark.sources.warc import (
                write_warc,
            )

            write_warc(
                pages, args.archive, url_col="url", date_col="warc_date",
                payload_col="payload", gzip_members=True, cdx=True,
                warcinfo={"software": "bakasura-spark crawl cli",
                          "format": "WARC File Format 1.0"},
            )
        decoded = decode_payload_udf()(F.col("payload"), F.col("content_type"))
        if args.boilerplate:
            from data_ingestion_tool_bakasura__spark.functions.boilerplate import (
                extract_main_content,
            )

            docs = extract_main_content(
                pages.select(F.col("norm_url").alias("doc_id"),
                             decoded.alias("_html")),
                "_html", "doc_id",
            ).select("doc_id", F.col("main_text").alias("text"))
        else:
            docs = pages.select(
                F.col("norm_url").alias("doc_id"), decoded.alias("text")
            ).withColumn("text", html_to_text_udf()(F.col("text")))
        docs = docs.filter(F.col("text") != "")
        if args.langid_profiles:  # FineWeb order: language before quality
            docs = CR.language_filter(
                docs, spark.read.parquet(args.langid_profiles),
                allowed_langs=(args.allowed_langs.split(",")
                               if args.allowed_langs else None),
                text_col="text", id_col="doc_id",
                keep_und=not args.drop_und,
            ).drop("lang")
        if args.quality_gate:
            docs = CR.web_quality_filter(docs, "text", args.quality_gate)
        rows = ingest_documents(docs, cfg=IngestConfig(embedding_dim=args.dim))
        n_new = client.store(rows)
        print(json.dumps({"event": "crawled", "new_chunks": n_new, **client.stats()}))
        return 0

    client = IndexClient(spark, args.index_dir)
    first = client.table().select("content_vector").first()
    if first and first["content_vector"] is not None:
        # the query must embed at the same dim the index was built with
        client.embedding_dim = len(first["content_vector"])
    if args.cmd == "stats":
        print(json.dumps(client.stats()))
        for r in client.document_stats().collect():
            print(json.dumps(r.asDict(), default=str))
        return 0

    if args.cmd == "build-ann":
        if args.increment:
            manifest = client.increment_ann(args.kind)
            print(json.dumps({"event": "ann_incremented", **manifest}))
        else:
            manifest = client.build_ann(args.kind)
            print(json.dumps({"event": "ann_built", **manifest}))
        return 0

    if args.mode == "text":
        fn = lambda q, k: client.search_text(q, k=k)
    elif args.mode == "vector":
        fn = lambda q, k: client.search_vector(q, k=k, index=args.index)
    else:
        fn = lambda q, k: client.search_hybrid(
            q, k=k, index=args.index, rerank=args.rerank
        )
    score_col = {"text": "bm25", "vector": "cos_sim", "hybrid": "rrf"}[args.mode]
    if args.cmd == "search" and args.mode == "hybrid" and args.rerank:
        score_col = "rerank"
    for r in fn(args.query, args.k).collect():
        print(
            json.dumps(
                {
                    "id": r["id"],
                    "filename": r["filename"],
                    score_col: r[score_col],
                    "content": (r["content"] or "")[:120],
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

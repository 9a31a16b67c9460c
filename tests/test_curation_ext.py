"""Round-5 curation extensions: PII redaction, sequence packing, int8
embedding quantization."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_ingestion_tool_bakasura__spark.functions.redact import redact_pii
from data_ingestion_tool_bakasura__spark.operators.sampling import pack_sequences
from data_ingestion_tool_bakasura__spark.operators.similarity import (
    quantize_embeddings,
)


def test_redact_pii_counts_and_cascade(spark):
    rows = [
        (1, "mail me at a.b+x@foo.co or b@bar.org thanks"),
        (2, "server 192.168.0.1 and 10.0.255.3 up"),
        (3, "call +1 555-0100  123 ok"),
        (4, "ssn 123-45-6789 file"),
        (5, "clean text, no identifiers here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert out[1]["n_pii_email"] == 2 and "[PII:email]" in out[1]["text"]
    assert "@" not in out[1]["text"].replace("[PII:email]", "")
    assert out[2]["n_pii_ipv4"] == 2
    assert out[2]["text"] == "server [PII:ipv4] and [PII:ipv4] up"
    assert out[3]["n_pii_phone"] == 1
    # the phone match must stop at the double-space boundary (at most
    # one separator between digits), leaving both input spaces behind
    assert out[3]["text"] == "call [PII:phone]  123 ok"
    assert out[4]["n_pii_ssn"] == 1 and "[PII:ssn]" in out[4]["text"]
    assert out[5]["text"] == rows[4][1]
    assert all(out[5][f"n_pii_{t}"] == 0 for t in ("email", "ssn", "ipv4", "phone"))


def test_redact_pii_ipv4_wins_over_phone(spark):
    # cascade order: the IPv4 is consumed before the phone rule runs,
    # so a '+'-prefixed run next to an IP cannot swallow it
    df = spark.createDataFrame(
        [(1, "+1 555-0100 host 10.2.3.7")], "doc_id int, text string"
    )
    r = redact_pii(df, "text").collect()[0]
    assert r["text"] == "[PII:phone] host [PII:ipv4]"


def test_pack_sequences_matches_naive_global_window(spark):
    import random

    rng = random.Random(5)
    rows = [(i, rng.randint(1, 400)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, tok int").repartition(7)
    cap = 1000
    got = {
        r["doc_id"]: (r["shard_id"], r["pack_pos"])
        for r in pack_sequences(df, "tok", cap).collect()
    }
    # naive reference: single global cumsum in seeded-hash order
    import hashlib

    order = sorted(rows, key=lambda r: (hashlib.md5(f"pack:{r[0]}".encode()).hexdigest(), r[0]))
    acc = 0
    for doc_id, tok in order:
        assert got[doc_id] == (acc // cap, acc % cap), doc_id
        acc += tok
    assert len(got) == len(rows)


def test_pack_sequences_shard_invariants(spark):
    import hashlib

    df = spark.createDataFrame([(i, 300) for i in range(20)], "doc_id long, tok int")
    out = {r["doc_id"]: r for r in pack_sequences(df, "tok", 1000).collect()}
    order = sorted(range(20), key=lambda i: hashlib.md5(f"pack:{i}".encode()).hexdigest())
    # fixed 300-token docs: the k-th doc in shuffle order starts at
    # token 300k -> shard 300k // 1000, offset 300k % 1000
    for k, doc_id in enumerate(order):
        assert out[doc_id]["shard_id"] == (300 * k) // 1000
        assert out[doc_id]["pack_pos"] == (300 * k) % 1000


def test_pack_sequences_n_buckets_is_wired(spark):
    """The n_buckets scale lever must (a) actually change how many
    prefix-sum buckets exist and (b) leave shard assignment untouched
    (buckets only partition the work, never the order)."""
    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(1, 400)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, tok int").repartition(7)
    base = {
        r["doc_id"]: (r["shard_id"], r["pack_pos"])
        for r in pack_sequences(df, "tok", 1000).collect()
    }
    for nb in (7, 1024):
        got = {
            r["doc_id"]: (r["shard_id"], r["pack_pos"])
            for r in pack_sequences(df, "tok", 1000, n_buckets=nb).collect()
        }
        assert got == base, f"shard assignment changed under n_buckets={nb}"
    # bucket populations: replicate the internal derivation and check the
    # lever really yields ~nb distinct buckets (2000 uniform hashes fill
    # far more than 256 of 1024 ranges; a silently-ignored parameter
    # would cap at 256)
    h = F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
    hv = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    n_distinct = {
        nb: df.select(
            F.floor(hv * nb / F.lit(4294967296)).alias("b")
        ).distinct().count()
        for nb in (256, 1024)
    }
    assert n_distinct[256] <= 256
    assert n_distinct[1024] > 256
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(df, "tok", 1000, n_buckets=0)


def test_quantize_embeddings_roundtrip_and_zero(spark):
    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [3.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    r1 = out[1]
    assert r1["q_scale"] == pytest.approx(1.0 / 127.0)
    # reconstruction error bounded by scale/2 per element
    for orig, q in zip(rows[0][1], r1["q_embedding"]):
        assert abs(q * r1["q_scale"] - orig) <= r1["q_scale"] / 2 + 1e-9
    # max-abs element saturates exactly
    assert min(r1["q_embedding"]) == -127
    r2 = out[2]
    assert r2["q_scale"] == 0.0 and list(r2["q_embedding"]) == [0, 0, 0, 0]
    assert out[3]["q_embedding"][0] == 127


def test_repeated_spans_planted_boilerplate(spark, tmp_path):
    """q_repeated_spans semantics on planted data: two docs share a
    25-token boilerplate run (-> 6 repeated 20-grams), a third is
    unique; also guards the xxhash64 gram-key path against the raw-gram
    oracle definition (counts must agree)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_ingestion_tool_bakasura__spark.plans.curation_q import (
        q_repeated_spans,
    )

    boiler = " ".join(f"b{i}" for i in range(25))
    rows = [
        (1, "web", boiler + " alpha beta gamma"),
        (2, "web", boiler + " delta epsilon zeta"),
        (3, "books", " ".join(f"u{i}" for i in range(40))),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "source": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/documents.parquet")
    out = {r["source"]: r for r in q_repeated_spans(spark, sf_dir).collect()}
    assert list(out) == ["web"]
    assert out["web"]["n_docs_with_repeats"] == 2
    assert out["web"]["n_repeated_grams"] == 6


def test_null_text_is_inert_in_token_and_gram_paths(spark, tmp_path):
    """ADVICE r7: NULL text must contribute 0 tokens (not legacy
    sizeOfNull's -1) and must emit NO grams (not a shared
    xxhash64(NULL) constant) so Spark stays in lockstep with the SQL
    oracles if NULL-text fixtures ever appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_ingestion_tool_bakasura__spark.functions import textstats as TS
    from data_ingestion_tool_bakasura__spark.plans.curation_q import q_repeated_spans

    df = spark.createDataFrame([("a b c",), (None,), ("",)], ["text"])
    got = [r[0] for r in df.select(TS.n_tokens_ws("text")).collect()]
    assert got == [3, 0, 0]

    boiler = " ".join(f"b{i}" for i in range(25))
    rows = [(1, "web", boiler), (2, "web", boiler), (3, "web", None), (4, "web", None)]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "source": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")
    out = {r["source"]: r for r in q_repeated_spans(spark, str(tmp_path)).collect()}
    # the two NULL docs must NOT register as sharing a gram; only the
    # planted boilerplate pair does (6 distinct 20-grams in 25 tokens)
    assert out["web"]["n_docs_with_repeats"] == 2
    assert out["web"]["n_repeated_grams"] == 6


def test_email_redaction_linear_on_hostile_blobs(spark):
    """r16 ReDoS review (measured): the unbounded email pattern was
    quadratic on '@'-bearing unbroken runs — 4s for ONE 20KB blob,
    hours for 1MB, and base64-with-@ blobs exist in any web corpus.
    The RFC 5321-bounded pattern ({1,64}@{1,255}) scans linearly, and
    still matches real emails identically."""
    import time

    from pyspark.sql import functions as F

    from data_ingestion_tool_bakasura__spark.functions import redact as RD

    blob = "junk a@" + "a" * 200_000 + " end x@mail.example.com tail"
    df = spark.createDataFrame([(1, blob)], "doc_id long, text string")
    t = time.time()
    out = RD.redact_pii(df, "text").collect()[0]
    took = time.time() - t
    assert out["n_pii_email"] == 1  # the real address, not the blob
    assert "[PII:email]" in out["text"]
    assert took < 30, f"email scan took {took:.1f}s on a 200KB blob"


def test_email_redaction_fully_masks_over_limit_addresses(spark):
    """r16 fix-chain review (reproduced): a tight {1,64} local bound
    PARTIALLY matched a 70-char local (SRS-rewritten forwards exceed
    64) and leaked its leading characters unredacted; the bounds now
    sit far above deliverable limits so such addresses mask fully."""
    from data_ingestion_tool_bakasura__spark.functions import redact as RD

    # 76-char local part, all in the local char class (an SRS-style
    # rewrite spelled with '.' separators — '=' was never in-class)
    addr = "SRS0.abcd.ef.origin.example." + "u" * 48 + "@forwarder.net"
    assert len(addr.split("@")[0]) > 64
    df = spark.createDataFrame(
        [(1, f"fwd from {addr} today")], "doc_id long, text string"
    )
    out = RD.redact_pii(df, "text").collect()[0]
    assert out["text"] == "fwd from [PII:email] today"  # no leaked prefix
    assert out["n_pii_email"] == 1

"""WebDataset-style tar-shard export/import (operators/shards.py):
roundtrip fidelity (text / binary / JSON members, NULL skips), shard
sizing and naming, manifest accounting, byte-level determinism, and
the packed-corpus composition."""

from __future__ import annotations

import json
import os
import tarfile

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.operators import shards as SH


def _df(spark):
    return spark.createDataFrame(
        [
            ("doc-3", "hello world", b"\x00\x01", {"lang": "en"}),
            ("doc-1", "bonjour", None, {"lang": "fr"}),      # NULL binary
            ("doc-2", None, b"\xff", {"lang": "de"}),        # NULL text
            ("a/b", "slash key", b"k", {"lang": "en"}),      # key sanitize
        ],
        "key string, text string, payload binary, meta map<string,string>",
    )


def test_roundtrip_and_members(spark, tmp_path):
    out = str(tmp_path / "shards")
    man = SH.write_tar_shards(
        _df(spark).repartition(1), out, "key",
        {"text": ".txt", "payload": ".bin", "meta": ".json"},
        rows_per_shard=10,
    ).collect()
    assert len(man) == 1 and man[0]["n_samples"] == 4
    # manifest sidecar for sessionless dataloaders
    side = json.load(open(os.path.join(out, "_manifest.json")))
    assert side[0]["shard"] == man[0]["shard"]

    with tarfile.open(os.path.join(out, man[0]["shard"])) as tar:
        names = tar.getnames()
    assert "doc-1.txt" in names and "doc-1.json" in names
    assert "doc-1.bin" not in names          # NULL skipped
    assert "doc-2.txt" not in names and "doc-2.bin" in names
    assert "a_b.txt" in names                # '/' sanitized
    # sample members are consecutive (sorted by key within partition)
    assert names.index("doc-1.txt") < names.index("doc-2.bin") < names.index(
        "doc-3.txt")

    back = SH.read_tar_shards(
        spark, out, {"text": ".txt", "payload": ".bin", "meta": ".json"}
    )
    rows = {r["key"]: r for r in back.collect()}
    assert rows["doc-3"]["text"] == "hello world"
    assert rows["doc-3"]["payload"] == bytearray(b"\x00\x01")
    assert json.loads(rows["doc-3"]["meta"]) == {"lang": "en"}
    assert rows["doc-1"]["payload"] is None
    assert rows["doc-2"]["text"] is None
    assert rows["a_b"]["text"] == "slash key"


def test_shard_sizing_and_naming(spark, tmp_path):
    out = str(tmp_path / "s2")
    df = spark.range(25).select(
        F.format_string("k%02d", F.col("id")).alias("key"),
        F.format_string("text %d", F.col("id")).alias("text"),
    )
    man = SH.write_tar_shards(
        df.repartition(2), out, "key", {"text": ".txt"}, rows_per_shard=7
    ).collect()
    # per-partition: ceil(n_p / 7) shards, no task collisions
    assert sum(r["n_samples"] for r in man) == 25
    assert all(r["n_samples"] <= 7 for r in man)
    names = sorted(r["shard"] for r in man)
    assert all(n.startswith("shard-") and n.endswith(".tar") for n in names)
    assert len(set(names)) == len(names)
    back = SH.read_tar_shards(spark, out, {"text": ".txt"})
    assert back.count() == 25


def test_deterministic_bytes(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _df(spark).repartition(1)
    SH.write_tar_shards(df, a, "key", rows_per_shard=10)
    SH.write_tar_shards(df, b, "key", rows_per_shard=10)
    fa = sorted(f for f in os.listdir(a) if f.endswith(".tar"))
    fb = sorted(f for f in os.listdir(b) if f.endswith(".tar"))
    assert fa == fb
    for f in fa:
        assert (open(os.path.join(a, f), "rb").read()
                == open(os.path.join(b, f), "rb").read())


def test_default_column_typing(spark, tmp_path):
    """Without an explicit columns map: string -> .txt, binary -> .bin,
    other -> .json."""
    out = str(tmp_path / "s3")
    df = spark.createDataFrame(
        [("k1", "t", b"b", 7)], "key string, text string, img binary, n int"
    )
    SH.write_tar_shards(df.repartition(1), out, "key")
    with tarfile.open(os.path.join(out, "shard-00000-0000.tar")) as tar:
        assert sorted(tar.getnames()) == ["k1.bin", "k1.json", "k1.txt"]
        assert json.loads(tar.extractfile("k1.json").read()) == 7


def test_packed_corpus_export(spark, tmp_path):
    """Composition: documents -> pack_sequences -> tar shards — the
    end-of-pipeline a training stack consumes."""
    from data_ingestion_tool_bakasura__spark.operators.sampling import (
        pack_sequences,
    )
    from data_ingestion_tool_bakasura__spark.sources.readers import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(200)
        .withColumn("n_tokens", F.size(F.split("text", r"\s+")))
    )
    packed = pack_sequences(docs, "n_tokens", capacity=512, id_col="doc_id")
    key = F.format_string(
        "sh%04d-p%06d", F.col("shard_id").cast("int"),
        F.col("pack_pos").cast("int"),
    )
    out = str(tmp_path / "packed")
    man = SH.write_tar_shards(
        packed.select(key.alias("key"), "text"), out, "key",
        {"text": ".txt"}, rows_per_shard=50,
    ).collect()
    n = sum(r["n_samples"] for r in man)
    assert n == packed.count() > 0
    back = SH.read_tar_shards(spark, out, {"text": ".txt"})
    assert back.count() == n


def test_export_shards_cli(spark, tmp_path, capsys):
    """curate_cli export-shards: docs parquet -> tar shards with
    consistent manifest accounting."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import curate_cli

    out = str(tmp_path / "shards")
    rc = curate_cli.main([
        "export-shards", "/root/testdata/sf0.001/documents.parquet", out,
        "--rows-per-shard", "200",
    ])
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and ev["event"] == "shards_exported"
    assert ev["n_samples"] == 500
    back = SH.read_tar_shards(spark, out, {"text": ".txt"})
    assert back.count() == 500


def test_empty_corpus_roundtrip(spark, tmp_path):
    """Zero input rows: a valid (empty) manifest, no shard files, and
    the reader returns an empty typed frame rather than erroring."""
    out = str(tmp_path / "empty")
    df = spark.createDataFrame([], "key string, text string")
    man = SH.write_tar_shards(df.repartition(2), out, "key").collect()
    assert man == []
    assert json.load(open(os.path.join(out, "_manifest.json"))) == []
    back = SH.read_tar_shards(spark, out, {"text": ".txt"})
    assert back.count() == 0 and set(back.columns) == {"shard", "key", "text"}


def test_stale_shards_cleaned_and_temps_hidden(spark, tmp_path):
    """r14-late review: (1) re-exporting into the same out_dir with a
    different shard size must not leave stale shards behind for
    read_tar_shards' glob to silently mix in — the writer pre-cleans
    its OWN naming scheme (shard-*.tar, attempt temps, the manifest)
    and never touches foreign files; (2) a zombie attempt's orphaned
    hidden temp is invisible to read-back; (3) the manifest is written
    via temp + os.replace, so no half-written JSON can sit at the
    advertised name."""
    import json
    import os

    from data_ingestion_tool_bakasura__spark.operators.shards import (
        read_tar_shards,
        write_tar_shards,
    )

    df = spark.createDataFrame(
        [(f"k{i:03d}", f"text {i}") for i in range(20)],
        "key string, text string",
    ).repartition(1)
    out = str(tmp_path / "shards")
    # run 1: many small shards
    write_tar_shards(df, out, rows_per_shard=5)
    assert len([e for e in os.listdir(out) if e.endswith(".tar")]) == 4
    # foreign file survives the pre-clean; zombie temp planted
    with open(os.path.join(out, "NOTES.txt"), "w") as f:
        f.write("keep me")
    with open(os.path.join(out, ".shard-00000-0000.tar.999.tmp"), "wb") as f:
        f.write(b"truncated zombie attempt bytes")
    # run 2: one big shard — run-1 shards and the zombie temp must go
    write_tar_shards(df, out, rows_per_shard=1000)
    tars = [e for e in os.listdir(out) if e.endswith(".tar")]
    assert tars == ["shard-00000-0000.tar"]
    assert os.path.exists(os.path.join(out, "NOTES.txt"))
    assert not any(e.endswith(".tmp") for e in os.listdir(out))
    man = json.load(open(os.path.join(out, "_manifest.json")))
    assert [m["shard"] for m in man] == tars
    back = read_tar_shards(spark, out, {"text": ".txt"})
    assert back.count() == 20


def test_duplicate_member_resolves_last_wins(spark, tmp_path):
    """r16 trust-boundary review (reproduced): tar permits duplicate
    member names and WebDataset's contract is last-wins (overwrite);
    the old max(data) pick resolved by BYTE comparison, so an appended
    k.txt lost to the original whenever its bytes sorted lower."""
    import io

    out = str(tmp_path / "dup")
    os.makedirs(out)
    with tarfile.open(os.path.join(out, "shard-00000-0000.tar"), "w") as tar:
        for data in (b"zzz first", b"aaa last"):  # last sorts LOWER
            info = tarfile.TarInfo(name="k1.txt")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    back = SH.read_tar_shards(spark, out, {"text": ".txt"}).collect()
    assert len(back) == 1
    assert back[0]["text"] == "aaa last"


def test_foreign_members_no_phantom_samples(spark, tmp_path):
    """r16 review: an extensionless foreign member (a stray README) or
    an unrequested extension used to materialize a phantom all-null
    sample row in typed reassembly; both are filtered before the
    pivot, and the raw table now exposes them with their tar ordinal."""
    import io

    out = str(tmp_path / "foreign")
    os.makedirs(out)
    with tarfile.open(os.path.join(out, "shard-00000-0000.tar"), "w") as tar:
        for name, data in (
            ("README", b"not a sample"),
            ("k1.txt", b"real sample"),
            ("k1.xyz", b"unrequested ext"),
        ):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    typed = SH.read_tar_shards(spark, out, {"text": ".txt"}).collect()
    assert [(r["key"], r["text"]) for r in typed] == [("k1", "real sample")]
    raw = {(r["key"], r["ext"]): r["pos"]
           for r in SH.read_tar_shards(spark, out).collect()}
    assert raw == {("README", ""): 0, ("k1", ".txt"): 1, ("k1", ".xyz"): 2}


def test_write_rejects_member_name_collisions(spark, tmp_path):
    """r16 review (both reproduced): (1) two columns mapped to one
    extension and (2) two keys with colliding sanitized forms each
    produced duplicate member names — tar accepted them, the manifest
    counted both samples, and the read silently merged them (manifest
    said 2, read returned 1 with fields mixed across the two rows)."""
    import pytest

    df = spark.createDataFrame(
        [("a/b", "text of a/b", "m1"), ("a_b", "text of a_b", "m2")],
        "key string, text string, meta string",
    ).coalesce(1)
    with pytest.raises(ValueError, match="both map to member extension"):
        SH.write_tar_shards(
            df, str(tmp_path / "s1"), columns={"text": ".txt", "meta": ".txt"}
        )
    with pytest.raises(Exception, match="duplicate sample key"):
        SH.write_tar_shards(
            df, str(tmp_path / "s2"),
            columns={"text": ".txt", "meta": ".json"}, rows_per_shard=10,
        )
    with pytest.raises(ValueError, match="rows_per_shard"):
        SH.write_tar_shards(df, str(tmp_path / "s3"), rows_per_shard=0)


def test_key_collision_across_shard_boundary_still_caught(spark, tmp_path):
    """r16 fix-chain review: clearing the seen-set at each shard cut
    let a sanitized collision straddling a rows_per_shard boundary
    through unguarded; the set is per-partition now."""
    import pytest

    df = spark.createDataFrame(
        [("a/b", "first"), ("a_b", "second")], "key string, text string"
    ).coalesce(1)
    with pytest.raises(Exception, match="duplicate sample key"):
        SH.write_tar_shards(
            df, str(tmp_path / "cut"),
            columns={"text": ".txt"}, rows_per_shard=1,
        )

"""Incremental + streaming video near-dup (C15 x C17): the persisted
shot-fingerprint index (`video_fingerprint_index`), the wave probe
(`video_near_dup_increment` — videos sampled+hashed exactly once,
ever) and the foreachBatch closure (`start_streaming_video_dedup`),
mirroring the image-side contracts: append-only index, replayed
waves are no-ops, hot-frame cap counted over index+wave combined,
index-append-first crash ordering."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.multimodal.media import (
    video_fingerprint_index,
    video_near_dup,
    video_near_dup_increment,
)


def _vid(*frames: str) -> bytearray:
    return bytearray(
        ("VID1|10|%d|" % len(frames)).encode() + b"\x00".join(f.encode() for f in frames)
    )


F1 = "the first shot of the film holds steady on the harbor at dawn x"
F2 = "a second shot pans across the market street in the morning rush"
F3 = "the third shot closes on the lighthouse beam over the dark water"
F4 = "an entirely different closing shot rolls credits over black sky"
F5 = "bonus behind the scenes footage plays after the credits conclude"


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [("a", _vid(F1, F2, F3)), ("z", _vid(F4, F5))],
        "media_id string, media binary",
    )


def test_increment_matches_batch_recompute(spark, corpus):
    """Index the corpus, probe a wave holding a re-cut of 'a' and a
    fresh video: pairs equal the batch recompute over corpus+wave
    restricted to pairs that touch the wave, with id_b the new side."""
    wave = spark.createDataFrame(
        [("b", _vid(F1, F2, F4)), ("q", _vid("lone unseen shot"))],
        "media_id string, media binary",
    )
    index = video_fingerprint_index(corpus, every_k=1)
    inc = video_near_dup_increment(
        index, wave, every_k=1, min_jaccard=0.2
    ).collect()
    batch = video_near_dup(
        corpus.unionByName(wave), every_k=1, min_jaccard=0.2
    ).collect()

    def canon(r):
        # the increment orients pairs new-side-last (id_b is always the
        # wave video), the batch op lexicographically — canonicalize
        a, b = (r["id_a"], r["n_a"]), (r["id_b"], r["n_b"])
        (ia, na), (ib, nb) = sorted([a, b])
        return (ia, ib, r["shared"], na, nb, r["jaccard"])

    as_set = {canon(r) for r in inc}
    batch_touching = {
        canon(r) for r in batch
        if "b" in (r["id_a"], r["id_b"]) or "q" in (r["id_a"], r["id_b"])
    }
    assert as_set == batch_touching
    # a<->b via two shared shots: jaccard 2/(3+3-2); z<->b via F4
    assert ("a", "b", 2, 3, 3, 0.5) in as_set
    assert ("b", "z", 1, 3, 2, 0.25) in as_set
    # increment orientation: the wave video is always id_b
    assert all(r["id_b"] in ("b", "q") for r in inc)


def test_increment_replay_is_noop(spark, corpus):
    index = video_fingerprint_index(corpus, every_k=1)
    replay = video_near_dup_increment(index, corpus, every_k=1, min_jaccard=0.2)
    assert replay.count() == 0  # wave ids already indexed -> dropped


def test_increment_precomputed_fingerprints(spark, corpus):
    wave = spark.createDataFrame(
        [("b", _vid(F1, F2, F4))], "media_id string, media binary"
    )
    fp = video_fingerprint_index(wave, every_k=1)
    index = video_fingerprint_index(corpus, every_k=1)
    a = video_near_dup_increment(index, wave, every_k=1, min_jaccard=0.2).collect()
    b = video_near_dup_increment(
        index, wave, every_k=1, min_jaccard=0.2, new_fingerprints=fp
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_increment_hot_frame_cap_combined(spark):
    """A frame hash seen in > cap videos across index+wave combined is
    dropped from candidates and sizes on both sides."""
    uniq = [F1, F2, F3]  # long sentences: distinct stand-in hashes
    idx_videos = spark.createDataFrame(
        [(f"i{k}", _vid("shared boilerplate station ident rolls before every file here", uniq[k]))
         for k in range(3)],
        "media_id string, media binary",
    )
    wave = spark.createDataFrame(
        [("w", _vid("shared boilerplate station ident rolls before every file here", F1))],
        "media_id string, media binary",
    )
    index = video_fingerprint_index(idx_videos, every_k=1)
    capped = video_near_dup_increment(
        index, wave, every_k=1, min_jaccard=0.2, max_videos_per_frame=2
    ).collect()
    # boilerplate dropped (4 videos > cap 2): only the i0 pair via its
    # unique shot survives, with post-cap sizes 1 and 1
    assert [(r["id_a"], r["id_b"], r["shared"], r["n_a"], r["n_b"])
            for r in capped] == [("i0", "w", 1, 1, 1)]


def test_streaming_video_dedup_three_waves(spark, tmp_path):
    from data_ingestion_tool_bakasura__spark.streaming.pipeline import (
        start_streaming_video_dedup,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    schema = "media_id string, media binary"

    def run_wave(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(src / "in")
        )
        q = start_streaming_video_dedup(
            spark.readStream.schema(schema).parquet(str(src / "in")),
            corpus,
            index,
            every_k=1,
            min_jaccard=0.4,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run_wave([("a", _vid(F1, F2, F3)), ("z", _vid(F4, F5))])
    ids1 = {r["media_id"] for r in spark.read.parquet(corpus).collect()}
    assert ids1 == {"a", "z"}
    # wave 2: a re-cut of 'a' (2 of 3 shots shared -> jaccard 0.5) is
    # dropped; a fresh video lands
    run_wave([("b", _vid(F1, F2, "a new closing shot")), ("n", _vid("fresh"))])
    ids2 = {r["media_id"] for r in spark.read.parquet(corpus).collect()}
    assert ids2 == {"a", "z", "n"}
    # index holds fingerprints for survivors only, hashed once ever
    idx = spark.read.parquet(index)
    assert set(r["video_id"] for r in idx.collect()) == {"a", "z", "n"}
    # wave 3: exact replay of wave 2 contributes nothing
    run_wave([("b", _vid(F1, F2, "a new closing shot")), ("n", _vid("fresh"))])
    assert {r["media_id"] for r in spark.read.parquet(corpus).collect()} == ids2
    assert spark.read.parquet(index).count() == idx.count()


def test_streaming_video_dedup_index_append_first(spark, tmp_path):
    """Crash-ordering contract: fingerprints of a batch land in the
    index before payloads land in the corpus (same reconciliation
    argument as the image closure) — simulated by checking the sink
    writes the index even when every payload row is a known replay."""
    from data_ingestion_tool_bakasura__spark.streaming.pipeline import (
        start_streaming_video_dedup,
    )

    src = tmp_path / "s"
    src.mkdir()
    corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
    schema = "media_id string, media binary"
    spark.createDataFrame([("a", _vid(F1, F2))], schema).write.parquet(
        str(src / "in")
    )
    start_streaming_video_dedup(
        spark.readStream.schema(schema).parquet(str(src / "in")),
        corpus, index, every_k=1, checkpoint=str(tmp_path / "k"),
    ).awaitTermination(120)
    # orphaned index rows (index written, corpus write "lost"): replay
    # must reconcile the corpus without double-indexing
    import shutil

    shutil.rmtree(corpus)
    start_streaming_video_dedup(
        spark.readStream.schema(schema).parquet(str(src / "in")),
        corpus, index, every_k=1, checkpoint=str(tmp_path / "k2"),
    ).awaitTermination(120)
    assert {r["media_id"] for r in spark.read.parquet(corpus).collect()} == {"a"}
    assert spark.read.parquet(index).groupBy("video_id", "fh").count().filter(
        "count > 1"
    ).count() == 0  # no duplicate fingerprint rows
    assert os.path.exists(corpus)

"""Structured-Streaming ingest: incremental shards -> compacted index must
equal the batch-built index on the same corpus (docnos + scores; docids are
hashed in streaming mode), plus windowed term counts with watermark."""

import os

import pytest
from pyspark.sql import functions as F

from pyterrier_pisa_spark.plans.pipeline import build_logical_index, retrieve
from pyterrier_pisa_spark.sources.index_store import load_index
from pyterrier_pisa_spark.streaming.ingest import (
    compact_stream_index,
    stream_index_shards,
    streaming_term_counts,
)

BATCH1 = [("d1", "spark streaming index build"), ("d2", "incremental shard merge")]
BATCH2 = [("d3", "late arriving spark document"), ("d4", "merge spark shards again")]


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "source")
    idx = str(root / "idx")
    os.makedirs(src, exist_ok=True)
    schema = "docno string, content string"

    spark.createDataFrame(BATCH1, schema=schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q1, q2 = stream_index_shards(stream, idx, stemmer="none")
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    # second micro-batch arrives later
    spark.createDataFrame(BATCH2, schema=schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q1, q2 = stream_index_shards(stream, idx, stemmer="none")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    return src, idx


def test_streamed_shards_exactly_once(spark, stream_dirs):
    _, idx = stream_dirs
    docmap = spark.read.parquet(os.path.join(idx, "docmap"))
    assert docmap.count() == 4
    assert docmap.select("docno").distinct().count() == 4


def test_compacted_index_matches_batch(spark, stream_dirs):
    _, idx = stream_dirs
    compact_stream_index(spark, idx, stemmer="none")
    pidx = load_index(spark, idx)
    assert pidx.stats["num_docs"] == 4

    queries = [("q1", "spark merge"), ("q2", "incremental")]
    streamed = retrieve(pidx.as_logical(), queries, k=10, include_query=False).toPandas()

    corpus = spark.createDataFrame(BATCH1 + BATCH2, schema="docno string, content string")
    batch = retrieve(build_logical_index(corpus, stemmer="none"), queries, k=10,
                     include_query=False).toPandas()
    s = streamed.sort_values(["qid", "docno"]).reset_index(drop=True)
    b = batch.sort_values(["qid", "docno"]).reset_index(drop=True)
    assert s["docno"].tolist() == b["docno"].tolist()
    assert s["qid"].tolist() == b["qid"].tolist()
    for a, c in zip(s["score"], b["score"]):
        assert a == pytest.approx(c, rel=1e-6)


def test_recompaction_after_more_data(spark, stream_dirs):
    src, idx = stream_dirs
    spark.createDataFrame([("d5", "brand new spark doc")], schema="docno string, content string") \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("docno string, content string").parquet(src)
    q1, q2 = stream_index_shards(stream, idx, stemmer="none")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    compact_stream_index(spark, idx, stemmer="none")
    pidx = load_index(spark, idx)
    assert pidx.stats["num_docs"] == 5


def test_streaming_term_counts_watermark(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        ("2024-01-01 00:01:00", "spark spark index"),
        ("2024-01-01 00:04:00", "spark merge"),
        ("2024-01-01 00:12:00", "index merge"),
    ]
    df = spark.createDataFrame(rows, schema="ts_s string, content string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("content string, ts timestamp").parquet(src)
    agg = streaming_term_counts(stream, window="10 minutes", watermark="5 minutes")
    q = (
        agg.writeStream.format("memory").queryName("termcounts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from termcounts").collect()
    d = {(str(r["window_start"]), r["term"]): r["n"] for r in out}
    assert d[("2024-01-01 00:00:00", "spark")] == 3
    assert d[("2024-01-01 00:10:00", "merge")] == 1


def test_streaming_dedup_exact_stateful(spark, tmp_path):
    """Stateful streaming dedup (applyInPandasWithState): each distinct
    content emitted exactly once — in-batch dups collapse to the min id,
    cross-batch dups are suppressed by the state store across a RESTART."""
    from pyterrier_pisa_spark.streaming.ingest import streaming_dedup_exact

    src = str(tmp_path / "dd_src")
    ckpt = str(tmp_path / "dd_ckpt")
    batch1 = spark.createDataFrame(
        [("d3", "xxx"), ("d1", "xxx"), ("d2", "yyy")],
        schema="docno string, content string")
    batch1.coalesce(1).write.mode("append").parquet(src)

    sink = str(tmp_path / "dd_out")

    def run():
        stream = spark.readStream.schema("docno string, content string").parquet(src)
        out = streaming_dedup_exact(stream, "content", "docno")
        q = (out.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["id"] for r in spark.read.parquet(sink).collect()}

    got1 = run()
    assert got1 == {"d1", "d2"}  # min-id per content within the batch

    # second epoch: d4 duplicates xxx (suppressed by the STATE STORE across
    # the restart), d5 is new
    batch2 = spark.createDataFrame(
        [("d4", "xxx"), ("d5", "zzz")], schema="docno string, content string")
    batch2.coalesce(1).write.mode("append").parquet(src)
    got2 = run()
    assert got2 == {"d1", "d2", "d5"}, got2


def test_watermark_drops_late_data_across_epochs(spark, tmp_path):
    """Append-mode watermark semantics end-to-end: a window is emitted once
    the watermark passes its end, and an event arriving BEHIND the watermark
    in a later epoch is dropped (the watermark persists in the checkpoint) —
    the late-data contract a 100 TB streaming ingest relies on."""
    src = str(tmp_path / "late_src")
    sink = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def run_epoch(rows):
        df = spark.createDataFrame(rows, schema="ts_s string, content string") \
            .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("content string, ts timestamp").parquet(src)
        agg = streaming_term_counts(stream, window="10 minutes", watermark="5 minutes")
        q = (agg.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(str(r["window_start"]), r["term"]): r["n"]
                for r in spark.read.parquet(sink).collect()}

    # epoch 1: two on-time events in window 00:00, one at 00:22 that pushes
    # the watermark to 00:17 and thereby CLOSES (emits) the 00:00 window
    out1 = run_epoch([
        ("2024-01-01 00:01:00", "spark index"),
        ("2024-01-01 00:04:00", "spark"),
        ("2024-01-01 00:22:00", "merge"),
    ])
    assert out1[("2024-01-01 00:00:00", "spark")] == 2  # emitted, late row absent

    # epoch 2: a LATE event for the already-closed 00:00 window (behind the
    # checkpointed watermark -> dropped) + 00:35 closes the 00:20 window
    out2 = run_epoch([
        ("2024-01-01 00:02:00", "spark"),          # late: must be dropped
        ("2024-01-01 00:35:00", "shard"),
    ])
    assert out2[("2024-01-01 00:00:00", "spark")] == 2   # unchanged by the late row
    assert out2[("2024-01-01 00:20:00", "merge")] == 1   # closed by epoch 2

"""Persisted index: parquet-backed tables + checkpoint-resumable phased build.

Layout (SURVEY.md §1.4 Spark mapping of the reference's flat-file artifact):

    <root>/
      meta.json          stemmer, block_size, scorer params, stats, version
      docmap/            (docid, docno, doclen, content_sha256)
      lexicon/           (term, term_id, df, cf)
      term_stats/        (term_id, max_score)           [scorer-keyed, B7]
      postings/          (term_id, block_id, count, docid_first, docid_last,
                          block_max_score, docids_delta, tfs, doclens)
      metrics/           (phase, partition_id, docs, postings, bytes, ts)
      _phases/<name>.done  checkpoint markers (JSON payload)

The build is four idempotent phases, each committed with a marker — the
checkpoint-resume boundary required by BASELINE.json's north_rule (mirrors
the reference's batch-shard -> merge boundary, ``indexers.py:89-120`` +
``_pisathon.cpp:572-584``, where shards already written survive a restart):

  1. tf       corpus -> termvec UDF -> (docid, term, tf, doclen) parquet
              + docmap parquet.  The parquet write IS the shard checkpoint.
  2. lexicon  tf -> (term, term_id, df, cf) + global stats.
  3. postings the single posting-granularity shuffle:
                tf ⋈ lexicon -> groupBy(term_id, chunk=docid//chunk_span)
                -> chunk rows (bounded <= chunk_span postings: Zipf-hot terms
                   spread across MANY chunk rows — the chunk key is a
                   deterministic salt, so no skewed reducer exists)
                -> per-term prefix-sum of chunk counts (tiny window over
                   chunk-count rows, never over postings)
                -> block-aligned segment split inside mapInPandas:
                   full aligned 128-blocks pack LOCALLY (no further shuffle);
                   only boundary partials (<= 2 per chunk) re-shuffle to merge
              -> varint-packed block rows, range-partitioned by term_id
                 (parquet min/max stats => term pruning at query time).
  4. maxscore per-term max of block maxes -> term_stats (scorer-keyed like
              the reference's WAND-data cache, ``_pisathon.cpp:229-255``).

Per-posting ``doclens`` are packed inside each block: +~1 byte/posting buys
query-time scoring with ZERO joins (no docid->doclen lookup shuffle), which
is the right trade for a read-heavy index.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import build as B
from ..operators import score as S
from ..operators.codec import varint_decode, varint_encode, delta_encode
from ..plans.pipeline import LogicalIndex, prepare_corpus

FORMAT_VERSION = 1
DEFAULT_CHUNK_SPAN = 1 << 16  # docids per chunk row (bounds collect_list row size)

POSTINGS_SCHEMA = (
    "term_id long, block_id long, count int, docid_first long, docid_last long, "
    "block_max_score double, docids_delta binary, tfs binary, doclens binary"
)
_SEGMENT_SCHEMA = (
    "term_id long, block_id long, aligned_full boolean, docids array<long>, "
    "tfs array<int>, doclens array<long>"
)


def _marker(path: str, name: str) -> str:
    return os.path.join(path, "_phases", f"{name}.done")


def _phase_done(path: str, name: str) -> bool:
    return os.path.exists(_marker(path, name))


def _commit_phase(path: str, name: str, payload: dict) -> None:
    os.makedirs(os.path.join(path, "_phases"), exist_ok=True)
    tmp = _marker(path, name) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, _marker(path, name))


def _append_metrics(spark: SparkSession, path: str, phase: str, rows: list[tuple]) -> None:
    df = spark.createDataFrame(
        rows, schema="phase string, partition_id long, docs long, postings long, bytes long, ts double"
    )
    df.coalesce(1).write.mode("append").parquet(os.path.join(path, "metrics"))


def _pack_block_pdf(rows: list[tuple]) -> pd.DataFrame:
    out = {
        "term_id": [], "block_id": [], "count": [], "docid_first": [], "docid_last": [],
        "block_max_score": [], "docids_delta": [], "tfs": [], "doclens": [],
    }
    for term_id, block_id, docids, tfs, doclens, bmax in rows:
        out["term_id"].append(term_id)
        out["block_id"].append(block_id)
        out["count"].append(len(docids))
        out["docid_first"].append(int(docids[0]))
        out["docid_last"].append(int(docids[-1]))
        out["block_max_score"].append(float(bmax))
        out["docids_delta"].append(varint_encode(delta_encode(docids).astype(np.uint64)))
        out["tfs"].append(varint_encode(np.asarray(tfs, dtype=np.uint64)))
        out["doclens"].append(varint_encode(np.asarray(doclens, dtype=np.uint64)))
    return pd.DataFrame(out)


def build_index(
    corpus: DataFrame,
    path: str,
    stemmer: str = "porter2",
    block_size: int = B.DEFAULT_BLOCK_SIZE,
    k1: float = B.DEFAULT_K1,
    b: float = B.DEFAULT_B,
    mode: str = "overwrite",
    docno_col: str | None = None,
    id_col: str | None = None,
    chunk_span: int = DEFAULT_CHUNK_SPAN,
    pretokenized: bool = False,
    scale: float = 100.0,
    num_partitions: int | None = None,
) -> "dict":
    """Build (or resume) a persisted index. Returns meta dict.

    mode: 'create' (error if exists, reference ``indexers.py:20-23``),
    'overwrite' (replace), 'resume' (skip completed phases — restartable at
    every phase boundary).
    """
    spark = corpus.sparkSession
    if os.path.exists(os.path.join(path, "meta.json")) or os.path.exists(os.path.join(path, "_phases")):
        if mode == "create":
            raise FileExistsError(f"index already exists at {path} (mode='create')")
        if mode == "overwrite":
            import shutil

            shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    t0 = time.time()
    # ---------------------------------------------------------- phase 1: tf
    if not _phase_done(path, "tf"):
        prepared = prepare_corpus(corpus, docno_col=docno_col, id_col=id_col,
                                  num_partitions=num_partitions)
        tf = _toks_tf(prepared, scale) if pretokenized else B.build_tf(prepared, stemmer=stemmer)
        # the tf parquet write IS the shard checkpoint; docmap derives from the
        # WRITTEN tf (no UDF recompute, no lineage nondeterminism)
        tf.write.mode("overwrite").parquet(os.path.join(path, "tf"))
        tf_r = spark.read.parquet(os.path.join(path, "tf"))
        doclens = tf_r.groupBy("docid").agg(F.first("doclen").alias("doclen"))
        docmap = (
            prepared.select("docid", "docno", "content_sha256")
            .join(doclens, "docid", "left").fillna({"doclen": 0})
            .select("docid", "docno", "doclen", "content_sha256")
        )
        docmap.write.mode("overwrite").parquet(os.path.join(path, "docmap"))
        ndocs = spark.read.parquet(os.path.join(path, "docmap")).count()
        nposts = tf_r.count()
        _append_metrics(spark, path, "tf", [("tf", -1, ndocs, nposts, 0, time.time())])
        _commit_phase(path, "tf", {"num_docs": ndocs, "tf_rows": nposts, "sec": time.time() - t0})

    tf = spark.read.parquet(os.path.join(path, "tf"))
    docmap = spark.read.parquet(os.path.join(path, "docmap"))

    # ----------------------------------------------------- phase 2: lexicon
    if not _phase_done(path, "lexicon"):
        t1 = time.time()
        lexicon = B.build_lexicon(tf, num_partitions)
        lexicon.write.mode("overwrite").parquet(os.path.join(path, "lexicon"))
        stats = B.collection_stats(docmap)
        stats["num_terms"] = spark.read.parquet(os.path.join(path, "lexicon")).count()
        _append_metrics(spark, path, "lexicon",
                        [("lexicon", -1, stats["num_docs"], stats["num_terms"], 0, time.time())])
        _commit_phase(path, "lexicon", {"stats": stats, "sec": time.time() - t1})

    stats = json.load(open(_marker(path, "lexicon")))["stats"]
    lexicon = spark.read.parquet(os.path.join(path, "lexicon"))

    # ---------------------------------------------------- phase 3: postings
    if not _phase_done(path, "postings"):
        t1 = time.time()
        _build_postings(spark, path, tf, lexicon, stats, block_size, k1, b, chunk_span,
                        num_partitions)
        pc = spark.read.parquet(os.path.join(path, "postings"))
        agg = pc.agg(F.count("*").alias("blocks"), F.sum("count").alias("postings"),
                     (F.sum(F.length("docids_delta")) + F.sum(F.length("tfs"))
                      + F.sum(F.length("doclens"))).alias("bytes")).collect()[0]
        _append_metrics(spark, path, "postings",
                        [("postings", -1, agg["blocks"], agg["postings"] or 0, agg["bytes"] or 0, time.time())])
        _commit_phase(path, "postings", {"blocks": agg["blocks"], "postings": int(agg["postings"] or 0),
                                         "compressed_bytes": int(agg["bytes"] or 0), "sec": time.time() - t1})

    # ---------------------------------------------------- phase 4: maxscore
    if not _phase_done(path, "maxscore"):
        t1 = time.time()
        pc = spark.read.parquet(os.path.join(path, "postings"))
        term_stats = pc.groupBy("term_id").agg(F.max("block_max_score").alias("max_score"))
        term_stats.write.mode("overwrite").parquet(os.path.join(path, "term_stats"))
        _commit_phase(path, "maxscore", {"sec": time.time() - t1})

    meta = {
        "version": FORMAT_VERSION,
        "type": "sparse_index",
        "format": "pyterrier_pisa_spark",
        "stemmer": stemmer if not pretokenized else "none",
        "pretokenized": pretokenized,
        "scale": scale if pretokenized else None,
        "block_size": block_size,
        "scorer": {"name": "bm25", "k1": k1, "b": b},
        "stats": stats,
        "built_sec": time.time() - t0,
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    return meta


def _toks_tf(prepared: DataFrame, scale: float) -> DataFrame:
    """Pretokenized (learned-sparse) path: ``toks: map<string,double>`` ->
    quantized impacts (reference ``indexers.py:97-107``: int(w*scale)
    truncation, drop <=0, doclen = sum of impacts)."""
    exploded = prepared.select(
        "docid", F.explode(F.col("toks")).alias("term", "weight")
    ).withColumn("tf", F.floor(F.col("weight") * F.lit(scale)).cast("int")).filter(F.col("tf") > 0)
    doclen = exploded.groupBy("docid").agg(F.sum("tf").cast("long").alias("doclen"))
    return exploded.join(doclen, "docid").select("docid", "term", "tf", "doclen")


def _build_postings(spark, path, tf, lexicon, stats, block_size, k1, b, chunk_span,
                    num_partitions) -> None:
    num_docs, avgdl = stats["num_docs"], stats["avg_doclen"]
    np_ = num_partitions or spark.sparkContext.defaultParallelism

    tf2 = tf.join(lexicon.select("term", "term_id", "df"), "term").select(
        "term_id", "docid", "tf", "doclen", "df"
    )
    chunked = (
        tf2.withColumn("chunk", (F.col("docid") / F.lit(chunk_span)).cast("long"))
        .groupBy("term_id", "chunk")
        .agg(
            F.first("df").alias("df"),
            F.sort_array(F.collect_list(F.struct("docid", "tf", "doclen"))).alias("plist"),
        )
        .withColumn("n", F.size("plist"))
    )
    # per-term prefix sums over chunk counts (rows = distinct (term,chunk): tiny
    # relative to postings; the window per term is over #chunks, never #postings)
    w = Window.partitionBy("term_id").orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)
    chunked = chunked.withColumn("start_pos", F.coalesce(F.sum("n").over(w), F.lit(0)))

    def _split_segments(batches):
        for pdf in batches:
            rows = {"term_id": [], "block_id": [], "aligned_full": [], "docids": [],
                    "tfs": [], "doclens": []}
            for term_id, start, plist in zip(pdf["term_id"], pdf["start_pos"], pdf["plist"]):
                n = len(plist)
                docids = np.fromiter((p["docid"] for p in plist), dtype=np.int64, count=n)
                tfs = np.fromiter((p["tf"] for p in plist), dtype=np.int64, count=n)
                dls = np.fromiter((p["doclen"] for p in plist), dtype=np.int64, count=n)
                pos = 0
                while pos < n:
                    gpos = start + pos
                    block_id = gpos // block_size
                    seg_end = min(n, pos + (block_size - gpos % block_size))
                    seg_len = seg_end - pos
                    rows["term_id"].append(term_id)
                    rows["block_id"].append(block_id)
                    rows["aligned_full"].append(seg_len == block_size)
                    rows["docids"].append(docids[pos:seg_end])
                    rows["tfs"].append(tfs[pos:seg_end].astype(np.int32))
                    rows["doclens"].append(dls[pos:seg_end])
                    pos = seg_end
            yield pd.DataFrame(rows)

    segments = chunked.select("term_id", "start_pos", "plist").mapInPandas(
        _split_segments, schema=_SEGMENT_SCHEMA
    )

    term_df = lexicon.select("term_id", "df")

    def _pack_full(key_iter):
        """Pack segments straight to block rows. Input pdfs carry df joined in."""
        for pdf in key_iter:
            rows = []
            for term_id, block_id, docids, tfs, dls, df_ in zip(
                pdf["term_id"], pdf["block_id"], pdf["docids"], pdf["tfs"], pdf["doclens"], pdf["df"]
            ):
                d = np.asarray(docids, dtype=np.int64)
                t = np.asarray(tfs, dtype=np.int64)
                dl = np.asarray(dls, dtype=np.int64)
                bmax = float(np.max(S.bm25_np(t.astype(np.float64), dl.astype(np.float64),
                                              float(df_), num_docs, avgdl, k1, b)))
                rows.append((term_id, block_id, d, t, dl, bmax))
            if rows:
                yield _pack_block_pdf(rows)

    full = segments.filter(F.col("aligned_full")).join(F.broadcast(term_df), "term_id")
    full_blocks = full.mapInPandas(_pack_full, schema=POSTINGS_SCHEMA)

    # boundary partials: <= 2 per (term, chunk); merge by (term_id, block_id)
    partial = (
        segments.filter(~F.col("aligned_full"))
        .groupBy("term_id", "block_id")
        .agg(
            F.flatten(F.sort_array(F.collect_list(F.struct(
                F.element_at("docids", 1).alias("d0"), "docids", "tfs", "doclens")))["docids"]).alias("docids"),
            F.flatten(F.sort_array(F.collect_list(F.struct(
                F.element_at("docids", 1).alias("d0"), "docids", "tfs", "doclens")))["tfs"]).alias("tfs"),
            F.flatten(F.sort_array(F.collect_list(F.struct(
                F.element_at("docids", 1).alias("d0"), "docids", "tfs", "doclens")))["doclens"]).alias("doclens"),
        )
        .join(F.broadcast(term_df), "term_id")
    )
    partial_blocks = partial.mapInPandas(_pack_full, schema=POSTINGS_SCHEMA)

    out = full_blocks.unionByName(partial_blocks)
    out = out.repartitionByRange(np_, "term_id", "block_id").sortWithinPartitions("term_id", "block_id")
    out.write.mode("overwrite").parquet(os.path.join(path, "postings"))


# ------------------------------------------------------------------ loading

@dataclass
class PersistedIndex:
    path: str
    meta: dict
    lexicon: DataFrame       # (term, term_id, df, cf, max_score)
    blocks: DataFrame        # packed postings
    docmap: DataFrame
    stats: dict

    def flat_tf(self) -> DataFrame:
        """Decode blocks back to (term_id, docid, tf, doclen) — the oracle
        view (also backs the reference's ``get_corpus_iter``, S5)."""
        def _decode(batches):
            for pdf in batches:
                outs = []
                for term_id, cnt, db, tb, lb in zip(
                    pdf["term_id"], pdf["count"], pdf["docids_delta"], pdf["tfs"], pdf["doclens"]
                ):
                    d = np.cumsum(varint_decode(db, int(cnt)).astype(np.int64))
                    t = varint_decode(tb, int(cnt)).astype(np.int64)
                    dl = varint_decode(lb, int(cnt)).astype(np.int64)
                    outs.append(pd.DataFrame({"term_id": term_id, "docid": d, "tf": t, "doclen": dl}))
                yield pd.concat(outs) if outs else pd.DataFrame(
                    {"term_id": [], "docid": [], "tf": [], "doclen": []})

        return self.blocks.select("term_id", "count", "docids_delta", "tfs", "doclens").mapInPandas(
            _decode, schema="term_id long, docid long, tf long, doclen long"
        )

    def as_logical(self) -> LogicalIndex:
        tf = self.flat_tf().join(self.lexicon.select("term_id", "term"), "term_id").select(
            "docid", "term", F.col("tf").cast("int").alias("tf"), "doclen"
        )
        return LogicalIndex(lexicon=self.lexicon, tf=tf, docmap=self.docmap,
                            stats=self.stats, blocks=self.blocks, meta=self.meta)


def load_index(spark: SparkSession, path: str) -> PersistedIndex:
    meta = json.load(open(os.path.join(path, "meta.json")))
    lexicon = spark.read.parquet(os.path.join(path, "lexicon"))
    term_stats = spark.read.parquet(os.path.join(path, "term_stats"))
    lexicon = lexicon.join(term_stats, "term_id", "left").fillna({"max_score": 0.0})
    return PersistedIndex(
        path=path,
        meta=meta,
        lexicon=lexicon,
        blocks=spark.read.parquet(os.path.join(path, "postings")),
        docmap=spark.read.parquet(os.path.join(path, "docmap")),
        stats=meta["stats"],
    )

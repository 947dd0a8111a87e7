"""Block-max pruned retrieval kernel (reference R7/R8: ``wand``,
``block_max_wand``, ``maxscore``, ``_pisathon.cpp:296-354``) re-designed for
Spark's execution model.

Parallelism model = the reference's own (R15, ``_pisathon.cpp:442-545``):
queries fan out across workers, each query is scored by ONE task over its
terms' posting blocks. Spark shape:

    broadcast(query-term table: term_id, qweight, df, max_score)
    blocks semi-joined to query terms     [parquet term_id range pruning]
    -> repartition by qid -> applyInPandas kernel per query:
         terms processed in descending max_score order (TAAT over numpy
         decoded blocks), threshold θ = current kth-best accumulated score,
         block skipped iff
             qweight*block_max + max(acc_max_in_block_range, 0) + rest_ub < θ
         (exact-score-preserving: a skipped block provably contains no doc
         that can reach the final top-k, so result docIDs AND scores equal
         the exhaustive plan — the contract pinned by the reference's
         variants matrix, ``tests/test_variants.py:7-28``)
    -> per-query top-k + (score DESC, docid ASC) tie-break + 0-based rank
       computed in-kernel -> docno join JVM-side.

BM25 idf is clamped to +1e-6 (PISA's ``bm25.hpp`` epsilon), so every partial
score is strictly positive, monotonicity holds for every query, and the
max-score bounds are always valid — pruning engages even for queries that
contain very common (df > N/2) terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import score as S
from .codec import varint_decode
from .retrieve import DEFAULT_NUM_RESULTS, query_terms_df


def _decode_posting_arrays(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cnt = int(row.count)
    d = np.cumsum(varint_decode(row.docids_delta, cnt).astype(np.int64))
    t = varint_decode(row.tfs, cnt).astype(np.float64)
    dl = varint_decode(row.doclens, cnt).astype(np.float64)
    return d, t, dl


def _merge_acc(acc_d, acc_s, new_d, new_s):
    """Merge sorted (docid, score) accumulators (TAAT accumulation)."""
    if acc_d.size == 0:
        return new_d, new_s
    if new_d.size == 0:
        return acc_d, acc_s
    all_d = np.concatenate([acc_d, new_d])
    all_s = np.concatenate([acc_s, new_s])
    uniq, inv = np.unique(all_d, return_inverse=True)
    out = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(out, inv, all_s)
    return uniq, out


def _taat_score(terms, by_term, num_docs, avg_doclen, k, k1, b, conjunctive):
    """Shared TAAT core: terms (sorted by max_score desc) over per-term block
    DataFrames -> (docids, scores) exact top-k candidates (unsorted beyond
    the guarantee that only docs outside any possible top-k were skipped)."""
    ubs = np.array([qw * ms for (_, qw, _, ms) in terms], dtype=np.float64)
    # BM25 idf is clamped to +1e-6 (score.IDF_EPS, matching PISA's epsilon),
    # so every partial is strictly positive and the max-score bounds are valid
    # for every query — pruning only yields to conjunctive semantics
    can_prune = not conjunctive
    rest_ub = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:], [0.0]])

    acc_d = np.empty(0, dtype=np.int64)
    acc_s = np.empty(0, dtype=np.float64)
    nmatch_d = acc_d
    nmatch_c = np.empty(0, dtype=np.int64)
    theta = -np.inf

    for i, (tid, qw, df_, _ms) in enumerate(terms):
        grp = by_term.get(int(tid))
        if grp is None:
            continue
        seg_d, seg_s = [], []
        for row in grp.itertuples():
            if can_prune and acc_d.size >= k and theta > -np.inf:
                lo = np.searchsorted(acc_d, row.docid_first, "left")
                hi = np.searchsorted(acc_d, row.docid_last, "right")
                acc_max = acc_s[lo:hi].max() if hi > lo else 0.0
                if qw * row.block_max_score + max(acc_max, 0.0) + rest_ub[i] < theta:
                    continue
            d, tf, dl = _decode_posting_arrays(row)
            seg_d.append(d)
            seg_s.append(qw * S.bm25_np(tf, dl, float(df_), num_docs, avg_doclen, k1, b))
        if seg_d:
            new_d = np.concatenate(seg_d)
            new_s = np.concatenate(seg_s)
            acc_d, acc_s = _merge_acc(acc_d, acc_s, new_d, new_s)
            if conjunctive:
                nmatch_d, nmatch_c = _merge_acc(
                    nmatch_d, nmatch_c.astype(np.float64), new_d, np.ones(new_d.size)
                )
                nmatch_c = nmatch_c.astype(np.int64)
        if can_prune and acc_s.size >= k:
            theta = np.partition(acc_s, acc_s.size - k)[acc_s.size - k]

    if conjunctive and acc_d.size:
        keep = nmatch_c >= len(terms)
        acc_d, acc_s = acc_d[keep], acc_s[keep]
    return acc_d, acc_s


def _topk_frame(qid, acc_d, acc_s, k):
    kk = min(k, acc_d.size)
    # top-k with (score DESC, docid ASC): lexsort on (-score, docid)
    order = np.lexsort((acc_d, -acc_s))[:kk]
    return pd.DataFrame({
        "qid": qid,
        "docid": acc_d[order],
        "score": acc_s[order],
        "rank": np.arange(kk, dtype=np.int32),
    })


_EMPTY = None


def _empty_frame():
    return pd.DataFrame({"qid": pd.Series(dtype=object),
                         "docid": pd.Series(dtype=np.int64),
                         "score": pd.Series(dtype=np.float64),
                         "rank": pd.Series(dtype=np.int32)})


def make_query_kernel(qinfo: dict, num_docs: int, avg_doclen: float,
                      k: int, k1: float, b: float, conjunctive: bool = False):
    """Build the per-query applyInPandas kernel. ``qinfo``: qid -> list of
    (term_id, qweight, df, max_score), sorted by max_score desc."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return _empty_frame()
        qid = pdf["qid"].iloc[0]
        terms = qinfo.get(qid)
        if not terms:
            return _empty_frame()
        by_term = {int(tid): grp.sort_values("block_id")
                   for tid, grp in pdf.groupby("term_id")}
        acc_d, acc_s = _taat_score(terms, by_term, num_docs, avg_doclen, k, k1, b,
                                   conjunctive)
        if acc_d.size == 0:
            return _empty_frame()
        return _topk_frame(qid, acc_d, acc_s, k)

    return kernel


def make_batch_kernel(qinfo: dict, num_docs: int, avg_doclen: float,
                      k: int, k1: float, b: float, chunk_span: int,
                      conjunctive: bool = False):
    """Kernel for the docid-partitioned BATCH mode: each task holds one index
    chunk's blocks (every block lies entirely inside one chunk by build
    contract) and scores ALL queries against them.

    Two batching wins over the naive per-query design:
    - per-posting BM25 partials are query-INDEPENDENT: each term's blocks are
      decoded + scored ONCE per task, as (local docid offset, partial) arrays;
    - the chunk's docid range is bounded by chunk_span, so per-query
      accumulation is direct fancy-indexing into a DENSE float accumulator
      (TAAT with dense accumulators — the reference's ranked_or_taat, R9) —
      no sort/unique per query.

    Emits local top-k per (chunk, query); the global window keeps the true
    top-k (exact: a doc in the global top-k is necessarily in its chunk's
    local top-k)."""
    tid_df = {}
    for terms in qinfo.values():
        for (tid, _qw, df_, _ms) in terms:
            tid_df[int(tid)] = float(df_)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return _empty_frame()
        acc = np.zeros(chunk_span, dtype=np.float64)
        cnt = np.zeros(chunk_span, dtype=np.int32)
        # per-query candidate accumulation ACROSS the task's chunks, so each
        # query emits AT MOST k rows per task (not per chunk) — the local
        # top-k merges over chunks before anything is shuffled
        q_docids: dict = {qid: [] for qid in qinfo}
        q_scores: dict = {qid: [] for qid in qinfo}
        for chunk, cpdf in pdf.groupby("chunk"):
            base = int(chunk) * chunk_span
            # decode + score each term once -> (local offsets, partials)
            term_arrays: dict[int, tuple] = {}
            for tid, grp in cpdf.groupby("term_id"):
                tid = int(tid)
                ds, ss = [], []
                for row in grp.itertuples():
                    d, tf, dl = _decode_posting_arrays(row)
                    ds.append(d - base)
                    ss.append(S.bm25_np(tf, dl, tid_df[tid], num_docs, avg_doclen, k1, b))
                term_arrays[tid] = (np.concatenate(ds), np.concatenate(ss))
            for qid, terms in qinfo.items():
                hit_tids = [(int(t[0]), t[1]) for t in terms if int(t[0]) in term_arrays]
                if not hit_tids:
                    continue
                if conjunctive and len(hit_tids) < len(terms):
                    continue  # some query term absent from this chunk entirely
                for tid, qw in hit_tids:
                    idx, sc = term_arrays[tid]
                    acc[idx] += qw * sc  # docids unique per term -> direct add
                    cnt[idx] += 1
                mask = cnt >= (len(terms) if conjunctive else 1)
                loc = np.flatnonzero(mask)
                if loc.size:
                    # keep only this chunk's top-k candidates per query —
                    # TIE-AWARE (score desc, docid asc): a score-only
                    # argpartition could drop the tie-preferred lower docid
                    # at the k boundary and break global rank identity
                    if loc.size > k:
                        order = np.lexsort((loc, -acc[loc]))[:k]
                        loc = loc[order]
                    q_docids[qid].append(base + loc)
                    q_scores[qid].append(acc[loc].copy())
                touched = np.flatnonzero(cnt > 0)
                acc[touched] = 0.0
                cnt[touched] = 0
        outs = []
        for qid in qinfo:
            if q_docids[qid]:
                d = np.concatenate(q_docids[qid])
                sc = np.concatenate(q_scores[qid])
                outs.append(_topk_frame(qid, d, sc, k))
        return pd.concat(outs, ignore_index=True) if outs else _empty_frame()

    return kernel


def retrieve_blockmax(
    index,  # PersistedIndex
    queries: list[tuple[str, str]],
    k: int = DEFAULT_NUM_RESULTS,
    stopwords="none",
    conjunctive: bool = False,
    include_query: bool = True,
    cast_float32: bool = True,
) -> DataFrame:
    """Pruned top-k retrieval over a persisted block index. Returns
    (qid[, query], docid, docno, score, rank) — rank-identical to the
    exhaustive plan."""
    spark = index.docmap.sparkSession
    meta = index.meta
    k1 = meta["scorer"]["k1"]
    b = meta["scorer"]["b"]
    stats = index.stats

    qterms = query_terms_df(spark, queries, stemmer=meta.get("stemmer", "porter2"),
                            stopwords=stopwords)
    matched = (
        F.broadcast(qterms)
        .join(index.lexicon.select("term", "term_id", "df", "max_score"), "term")
        .select("qid", "term_id", "qweight", "df", "max_score")
        .collect()
    )
    qinfo: dict[str, list] = {}
    for r in matched:
        qinfo.setdefault(r["qid"], []).append(
            (int(r["term_id"]), float(r["qweight"]), float(r["df"]), float(r["max_score"]))
        )
    for qid in qinfo:
        qinfo[qid].sort(key=lambda t: -t[3])

    tid_qids: list[tuple[int, str]] = []
    for qid, terms in qinfo.items():
        for (tid, _, _, _) in terms:
            tid_qids.append((tid, qid))
    if not tid_qids:
        out = spark.createDataFrame([], schema="qid string, docid long, docno string, score float, rank int")
        return out
    tq = spark.createDataFrame(tid_qids, schema="term_id long, qid string")

    # isin filter reaches the parquet scan (row-group min/max pruning on the
    # range-partitioned postings files) before the broadcast join fans out
    tids = sorted({tid for tid, _ in tid_qids})
    cand = index.blocks.filter(F.col("term_id").isin(tids)).join(F.broadcast(tq), "term_id").select(
        "qid", "term_id", "block_id", "count", "docid_first", "docid_last",
        "block_max_score", "docids_delta", "tfs", "doclens"
    )
    kernel = make_query_kernel(qinfo, stats["num_docs"], stats["avg_doclen"], k, k1, b,
                               conjunctive=conjunctive)
    results = cand.groupBy("qid").applyInPandas(
        kernel, schema="qid string, docid long, score double, rank int"
    )
    out = results.join(index.docmap.select("docid", "docno"), "docid")
    # reference pins float32 result dtype (__init__.py:500-503); keep double
    # when the caller compares against a double-precision oracle
    score_col = F.col("score").cast("float").alias("score") if cast_float32 else F.col("score")
    if include_query:
        qdf = spark.createDataFrame(queries, schema="qid string, query string")
        out = out.join(F.broadcast(qdf), "qid")
        return out.select("qid", "query", "docid", "docno", score_col, "rank")
    return out.select("qid", "docid", "docno", score_col, "rank")


def retrieve_blockmax_batch(
    index,  # PersistedIndex
    queries: list[tuple[str, str]],
    k: int = DEFAULT_NUM_RESULTS,
    stopwords="none",
    conjunctive: bool = False,
    include_query: bool = True,
    cast_float32: bool = True,
) -> DataFrame:
    """Batch-throughput retrieval: partition the candidate blocks by index
    CHUNK (docid range) and score the whole query batch inside each chunk
    task, then keep the global top-k per query with a window.

    vs ``retrieve_blockmax`` (per-query fan-out): candidate blocks are
    shuffled ONCE for the whole batch instead of once per query — the right
    plan when many queries share hot terms (batch analytics / evaluation
    runs). Per-chunk conjunctive filtering stays exact because every posting
    of docid d (any term) lives in chunk(d) by the build contract.
    Results are rank- and score-identical to the exhaustive plan."""
    from ..operators.retrieve import topk as _topk_plan

    spark = index.docmap.sparkSession
    meta = index.meta
    k1, b = meta["scorer"]["k1"], meta["scorer"]["b"]
    chunk_span = meta.get("chunk_span", 1 << 16)
    stats = index.stats

    qterms = query_terms_df(spark, queries, stemmer=meta.get("stemmer", "porter2"),
                            stopwords=stopwords)
    matched = (
        F.broadcast(qterms)
        .join(index.lexicon.select("term", "term_id", "df", "max_score"), "term")
        .select("qid", "term_id", "qweight", "df", "max_score")
        .collect()
    )
    qinfo: dict[str, list] = {}
    for r in matched:
        qinfo.setdefault(r["qid"], []).append(
            (int(r["term_id"]), float(r["qweight"]), float(r["df"]), float(r["max_score"]))
        )
    for qid in qinfo:
        qinfo[qid].sort(key=lambda t: -t[3])
    tids = sorted({t[0] for terms in qinfo.values() for t in terms})
    if not tids:
        return spark.createDataFrame(
            [], schema="qid string, docid long, docno string, score float, rank int")

    cand = index.blocks.filter(F.col("term_id").isin(tids)).withColumn(
        "chunk", (F.col("docid_first") / F.lit(chunk_span)).cast("long")
    )
    # hash chunks into a FIXED number of task groups: each query emits <= k
    # rows per GROUP (the kernel merges its chunks' top-ks locally), so the
    # final window sees O(n_groups * queries * k) rows — independent of how
    # many chunks the corpus spans AND of the cluster size (a core count
    # -dependent group count would change the work itself between cluster
    # sizes, breaking scaling comparability)
    n_groups = int(meta.get("batch_groups", 32))
    cand = cand.withColumn("task_group", F.pmod(F.col("chunk"), F.lit(n_groups)))
    kernel = make_batch_kernel(qinfo, stats["num_docs"], stats["avg_doclen"], k, k1, b,
                               chunk_span, conjunctive=conjunctive)
    local = cand.groupBy("task_group").applyInPandas(
        kernel, schema="qid string, docid long, score double, rank int"
    ).drop("rank")
    top = _topk_plan(local, k)
    out = top.join(index.docmap.select("docid", "docno"), "docid")
    score_col = F.col("score").cast("float").alias("score") if cast_float32 else F.col("score")
    if include_query:
        qdf = spark.createDataFrame(queries, schema="qid string, query string")
        out = out.join(F.broadcast(qdf), "qid")
        return out.select("qid", "query", "docid", "docno", score_col, "rank")
    return out.select("qid", "docid", "docno", score_col, "rank")

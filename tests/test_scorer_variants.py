"""Variants matrix (reference ``tests/test_variants.py:7-28``): every scorer
runs under every retrieval algorithm — exhaustive, per-query pruned, batch —
and all three are rank- AND score-identical. Also pins the per-query
kernel's multi-task fan-out (no one-task-per-query hot-spot) and the
scorer-keyed term-stats cache."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyterrier_pisa_spark.operators.wand import (retrieve_blockmax,
                                                 retrieve_blockmax_batch)
from pyterrier_pisa_spark.plans.pipeline import retrieve
from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
from pyterrier_pisa_spark.sources.index_store import (build_index,
                                                      ensure_term_stats,
                                                      load_index)

QUERIES = [
    ("q1", "parse index query"),
    ("q2", "def return"),
    ("q3", "merge shard stream"),
    ("q4", "var3 zzznothing"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("svidx") / "idx")
    corpus = synth_code_corpus(spark, num_docs=400, seed=11)
    # small chunk_span -> blocks span many chunks/task groups
    build_index(corpus, path, stemmer="porter2", block_size=32, chunk_span=64,
                mode="overwrite")
    return load_index(spark, path)


def _cmp(a, b):
    a = a.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = b.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert a["qid"].tolist() == b["qid"].tolist()
    assert a["docid"].tolist() == b["docid"].tolist()
    assert (a["rank"] == b["rank"]).all()
    np.testing.assert_allclose(a["score"], b["score"], rtol=1e-5)


@pytest.mark.parametrize("scorer", ["bm25", "dph", "pl2", "qld"])
def test_pruned_and_batch_match_exhaustive(spark, idx, scorer):
    exh = retrieve(idx.as_logical(), QUERIES, scorer=scorer, k=25,
                   include_query=False).toPandas()
    per_q = retrieve_blockmax(idx, QUERIES, scorer=scorer, k=25,
                              include_query=False).toPandas()
    batch = retrieve_blockmax_batch(idx, QUERIES, scorer=scorer, k=25,
                                    include_query=False).toPandas()
    assert len(exh) > 0
    _cmp(per_q, exh)
    _cmp(batch, exh)


def test_bm25_nondefault_params_rebuild_term_stats(spark, idx):
    # k1/b differing from the build params must not reuse the stored
    # (build-param) max-scores — the scorer-keyed cache provides fresh ones
    exh = retrieve(idx.as_logical(), QUERIES, scorer="bm25", k=25,
                   include_query=False, k1=1.2, b=0.75).toPandas()
    per_q = retrieve_blockmax(idx, QUERIES, scorer="bm25", k=25,
                              include_query=False, k1=1.2, b=0.75).toPandas()
    _cmp(per_q, exh)
    key_dir = [d for d in os.listdir(idx.path) if d.startswith("term_stats_bm25_k1_1p2")]
    assert key_dir, "scorer-keyed term_stats cache not materialized"


def test_term_stats_cache_key_reused(spark, idx):
    ts1 = ensure_term_stats(idx, "dph")
    before = set(os.listdir(idx.path))
    ts2 = ensure_term_stats(idx, "dph")
    assert set(os.listdir(idx.path)) == before  # cache hit, no new dirs
    assert ts1.count() == ts2.count() > 0


def test_term_stats_are_true_maxima(spark, idx):
    """Per-term max_score for dph must equal the max per-posting dph partial
    computed from the flat postings view (bound validity = pruning safety)."""
    from pyterrier_pisa_spark.operators import score as S

    ts = ensure_term_stats(idx, "dph").toPandas().set_index("term_id")["max_score"]
    flat = idx.flat_tf().join(idx.lexicon.select("term_id", "cf"), "term_id").toPandas()
    part = S.np_partial_fn("dph", idx.stats)
    got = {}
    for tid, grp in flat.groupby("term_id"):
        got[tid] = part(grp["tf"].to_numpy(np.float64),
                        grp["doclen"].to_numpy(np.float64),
                        float(grp["cf"].iloc[0])).max()
    for tid, mx in got.items():
        assert ts[tid] == pytest.approx(mx, rel=1e-12), tid


def test_per_query_mode_spans_multiple_tasks(spark, idx):
    """The per-query kernel partitions a query's candidate blocks by
    (qid, task_group) — a multi-chunk index must yield >1 group for a common
    term (the round-1 one-task-per-query hazard is gone)."""
    assert idx.meta["batch_groups"] >= 32
    chunk_span = idx.meta["chunk_span"]
    n_groups = idx.meta["batch_groups"]
    # pick the hottest term and count the distinct task groups its blocks hit
    hot = idx.lexicon.orderBy(F.desc("df")).first()
    groups = (
        idx.blocks.filter(F.col("term_id") == hot["term_id"])
        .withColumn("chunk", (F.col("docid_first") / F.lit(chunk_span)).cast("long"))
        .withColumn("task_group", F.pmod(F.col("chunk"), F.lit(n_groups)))
        .select("task_group").distinct().count()
    )
    assert groups > 1


def test_batch_groups_scales_with_index_size(spark, tmp_path_factory):
    """batch_groups is derived from index size at BUILD time (meta-recorded):
    more chunks -> more task groups, capped, never below the floor."""
    path = str(tmp_path_factory.mktemp("bg") / "idx")
    corpus = synth_code_corpus(spark, num_docs=300, seed=3)
    build_index(corpus, path, stemmer="none", chunk_span=4, mode="overwrite")
    meta = load_index(spark, path).meta
    # 300 docs / span 4 = 75 chunks -> 75 groups (above the 32 floor)
    assert meta["batch_groups"] == 75


def test_quantized_index_per_query_kernel(spark, tmp_path):
    """Quantized (precompute_impact) indexes run under the PER-QUERY pruned
    kernel too, with block maxes trusted as absolute impact bounds — results
    identical to the batch kernel."""
    from pyterrier_pisa_spark.sources.index_store import quantize_index

    src = str(tmp_path / "q_src")
    corpus = synth_code_corpus(spark, num_docs=250, seed=21)
    build_index(corpus, src, stemmer="porter2", block_size=32, chunk_span=64,
                mode="overwrite")
    idx = load_index(spark, src)
    qpath = str(tmp_path / "q_dst")
    quantize_index(idx, qpath, scorer="bm25", bits=8)
    qidx = load_index(spark, qpath)
    per_q = retrieve_blockmax(qidx, QUERIES, scorer="quantized", k=20,
                              include_query=False).toPandas()
    batch = retrieve_blockmax_batch(qidx, QUERIES, scorer="quantized", k=20,
                                    include_query=False).toPandas()
    assert len(per_q) > 0
    _cmp(per_q, batch)


def test_random_corpora_three_path_equivalence(spark):
    """Randomized mini-corpora: exhaustive plan, per-query pruned kernel and
    batch kernel must be rank+score identical for every scorer (seeded
    sweep — a cheap deterministic stand-in for a hypothesis stateful test,
    which would respawn Spark jobs per example)."""
    import random

    from pyterrier_pisa_spark.sources.index_store import build_index as _bi

    for seed in (3, 17):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        docs = [(f"d{i}", " ".join(rng.choices(vocab, k=rng.randint(1, 40))))
                for i in range(120)]
        corpus = spark.createDataFrame(docs, schema="docno string, content string")
        import tempfile

        path = tempfile.mkdtemp(prefix=f"rnd{seed}_") + "/idx"
        _bi(corpus, path, stemmer="none", block_size=16, chunk_span=32,
            mode="overwrite")
        idx = load_index(spark, path)
        queries = [("r1", "w0 w1 w2"), ("r2", " ".join(rng.choices(vocab, k=4))),
                   ("r3", "w29 zzz")]
        for scorer in ("bm25", "qld"):
            exh = retrieve(idx.as_logical(), queries, scorer=scorer, k=15,
                           include_query=False).toPandas()
            per_q = retrieve_blockmax(idx, queries, scorer=scorer, k=15,
                                      include_query=False).toPandas()
            batch = retrieve_blockmax_batch(idx, queries, scorer=scorer, k=15,
                                            include_query=False).toPandas()
            _cmp(per_q, exh)
            _cmp(batch, exh)

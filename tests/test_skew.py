"""Zipf-skew stress: a term present in EVERY document (the north_rule's
stopword-like code token) must build and query correctly — its postings
spread across many chunk rows (the deterministic salt), never one reducer."""

import pytest
from pyspark.sql import functions as F

from pyterrier_pisa_spark.operators.wand import retrieve_blockmax, retrieve_blockmax_batch
from pyterrier_pisa_spark.plans.pipeline import retrieve
from pyterrier_pisa_spark.sources.index_store import build_index, load_index

N = 3000


@pytest.fixture(scope="module")
def skew_idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skew") / "idx")
    # every doc contains 'hotterm' (3x) + a unique rare term + a medium term
    corpus = spark.range(N).selectExpr(
        "id as doc_id",
        "cast(id as string) as docno",
        "concat('hotterm hotterm hotterm rare', id, ' med', id % 50) as content",
    )
    build_index(corpus, path, stemmer="none", id_col="doc_id", block_size=32,
                chunk_span=128, mode="overwrite")
    return load_index(spark, path)


def test_hot_term_blocks_spread(spark, skew_idx):
    lex = {r["term"]: (r["term_id"], r["df"], r["cf"])
           for r in skew_idx.lexicon.collect() if r["term"] == "hotterm"}
    tid, df_, cf_ = lex["hotterm"]
    assert df_ == N and cf_ == 3 * N
    blocks = skew_idx.blocks.filter(F.col("term_id") == tid).collect()
    # chunk-local blocks: ~N/chunk_span chunks, each <= ceil(128/32) blocks
    assert len(blocks) >= N // 128
    assert all(b["count"] <= 32 for b in blocks)
    # every posting accounted for
    assert sum(b["count"] for b in blocks) == N


def test_hot_term_query_exact(spark, skew_idx):
    queries = [("s1", "hotterm rare7"), ("s2", "hotterm med13")]
    pruned = retrieve_blockmax(skew_idx, queries, k=50, include_query=False).toPandas()
    batch = retrieve_blockmax_batch(skew_idx, queries, k=50, include_query=False).toPandas()
    exh = retrieve(skew_idx.as_logical(), queries, k=50, include_query=False).toPandas()
    for df in (pruned, batch):
        a = df.sort_values(["qid", "rank"]).reset_index(drop=True)
        e = exh.sort_values(["qid", "rank"]).reset_index(drop=True)
        assert a["docid"].tolist() == e["docid"].tolist()
    # rare7 doc must rank first for s1 (it matches both terms)
    top = exh[exh.qid == "s1"].sort_values("rank").iloc[0]
    assert top["docno"] == "7"

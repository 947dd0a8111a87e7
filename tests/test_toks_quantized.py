"""Pretokenized (learned-sparse) path: exact quantization arithmetic pinned
by the reference's goldens (``tests/test_dict.py:49-79``):

  doc {a:7.3, b:3.99} scale=1  x  query {a:2.3, b:4.1} toks_scale=1
      -> int(7.3)*int(2.3) + int(3.99)*int(4.1) = 7*2 + 3*4 = 26.0
  scale=85.4, toks_scale=11.2
      -> int(7.3*85.4)*int(2.3*11.2) + int(3.99*85.4)*int(4.1*11.2) = 30875.0
"""

import pytest
from pyspark.sql import functions as F

from pyterrier_pisa_spark.plans.pipeline import (
    build_logical_index_toks,
    retrieve_toks,
)
from pyterrier_pisa_spark.sources.index_store import build_index, load_index


def _toks_corpus(spark):
    return spark.createDataFrame(
        [("d1", {"a": 7.3, "b": 3.99}), ("d2", {"b": 1.0, "c": 2.0})],
        schema="docno string, toks map<string,double>",
    )


def test_quantized_score_scale1(spark):
    idx = build_logical_index_toks(_toks_corpus(spark), scale=1.0)
    res = retrieve_toks(idx, [("q1", {"a": 2.3, "b": 4.1})], toks_scale=1.0, k=10).collect()
    scores = {r["docno"]: r["score"] for r in res}
    assert scores["d1"] == pytest.approx(26.0)  # 7*2 + 3*4
    assert scores["d2"] == pytest.approx(4.0)   # b: 1*4


def test_quantized_score_scaled(spark):
    idx = build_logical_index_toks(_toks_corpus(spark), scale=85.4)
    res = retrieve_toks(idx, [("q1", {"a": 2.3, "b": 4.1})], toks_scale=11.2, k=10).collect()
    scores = {r["docno"]: r["score"] for r in res}
    expect = int(7.3 * 85.4) * int(2.3 * 11.2) + int(3.99 * 85.4) * int(4.1 * 11.2)
    assert expect == 30875
    assert scores["d1"] == pytest.approx(float(expect))


def test_quantization_drops_nonpositive(spark):
    corpus = spark.createDataFrame(
        [("d1", {"a": 0.4, "b": 2.0})], schema="docno string, toks map<string,double>"
    )
    idx = build_logical_index_toks(corpus, scale=1.0)  # int(0.4) = 0 -> dropped
    lex = {r["term"] for r in idx.lexicon.collect()}
    assert lex == {"b"}
    # doclen = sum of impacts (reference indexers.py:107)
    dm = idx.docmap.collect()[0]
    assert dm["doclen"] == 2


def test_query_weights_truncate(spark):
    idx = build_logical_index_toks(_toks_corpus(spark), scale=1.0)
    # int(0.9 * 1.0) = 0 -> term contributes nothing (reference repeats the
    # term int(w) times, i.e. zero times)
    res = retrieve_toks(idx, [("q1", {"a": 0.9})], toks_scale=1.0, k=10).collect()
    assert res == []


def test_persisted_toks_index_roundtrip(spark, tmp_path):
    path = str(tmp_path / "toks_idx")
    build_index(_toks_corpus(spark), path, pretokenized=True, scale=1.0,
                mode="overwrite", block_size=4)
    idx = load_index(spark, path)
    assert idx.meta["pretokenized"] is True
    logical = idx.as_logical()
    tf = {(r["term"], r["docid"]): r["tf"] for r in logical.tf.collect()}
    docnos = {r["docid"]: r["docno"] for r in idx.docmap.collect()}
    byname = {(t, docnos[d]): v for (t, d), v in tf.items()}
    assert byname == {("a", "d1"): 7, ("b", "d1"): 3, ("b", "d2"): 1, ("c", "d2"): 2}

"""End-to-end slice: build logical index -> exhaustive BM25 retrieval,
validated against hand-computed arithmetic (SURVEY.md §5 strategy (a)) and
the reference's ordering/tie-break contract (``_pisathon.cpp:512-528``)."""

import math

import pytest

from pyterrier_pisa_spark.operators.build import assign_dense_ids
from pyterrier_pisa_spark.plans.pipeline import build_logical_index, retrieve, search

DOCS = [
    # docno, content
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog sat"),
    ("d3", "cats and dogs"),
    ("d4", "a mat for a cat , a mat"),
]


def bm25_hand(tf, dl, df, n, avgdl, k1=0.9, b=0.4):
    # idf clamped to PISA's epsilon (bm25.hpp query_term_weight)
    idf = max(1e-6, math.log((n - df + 0.5) / (df + 0.5)))
    return idf * (k1 + 1) * tf / (tf + k1 * (1 - b + b * dl / avgdl))


@pytest.fixture(scope="module")
def index(spark):
    corpus = spark.createDataFrame(DOCS, schema="docno string, content string")
    return build_logical_index(corpus, stemmer="none")


def test_stats(index):
    # doclens: d1=6 d2=3 d3=3 d4=7 (comma dropped by tokenizer)
    assert index.stats["num_docs"] == 4
    assert index.stats["total_doclen"] == 19
    assert index.stats["avg_doclen"] == pytest.approx(19 / 4)
    assert index.num_terms() == 11  # the cat sat on mat dog cats and dogs a for


def test_docids_are_docno_order(index):
    rows = {r["docno"]: r["docid"] for r in index.docmap.collect()}
    assert rows == {"d1": 0, "d2": 1, "d3": 2, "d4": 3}


def test_lexicon_sorted_dense_ids(index):
    rows = index.lexicon.orderBy("term_id").collect()
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms)
    assert [r["term_id"] for r in rows] == list(range(len(rows)))
    lex = {r["term"]: (r["df"], r["cf"]) for r in rows}
    assert lex["cat"] == (2, 2)
    assert lex["the"] == (2, 3)
    assert lex["mat"] == (2, 3)
    assert lex["a"] == (1, 3)


def test_bm25_hand_computed(index):
    res = search(index, "cat mat", k=10).collect()
    got = {r["docno"]: (r["score"], r["rank"]) for r in res}
    n, avgdl = 4, 19 / 4
    # d1: cat tf1 dl6, mat tf1 dl6 ; d4: cat tf1 dl7, mat tf2 dl7
    exp_d1 = bm25_hand(1, 6, 2, n, avgdl) + bm25_hand(1, 6, 2, n, avgdl)
    exp_d4 = bm25_hand(1, 7, 2, n, avgdl) + bm25_hand(2, 7, 2, n, avgdl)
    assert got["d1"][0] == pytest.approx(exp_d1, rel=1e-6)
    assert got["d4"][0] == pytest.approx(exp_d4, rel=1e-6)
    assert set(got) == {"d1", "d4"}
    # ordering: higher score first
    want_order = sorted([("d1", exp_d1), ("d4", exp_d4)], key=lambda x: -x[1])
    ranks = sorted(got.items(), key=lambda kv: kv[1][1])
    assert [d for d, _ in ranks] == [d for d, _ in want_order]


def test_tie_break_docid_asc(spark):
    # two identical docs -> identical scores -> tie broken by docid ASC
    corpus = spark.createDataFrame(
        [("a", "zebra"), ("b", "zebra")], schema="docno string, content string"
    )
    idx = build_logical_index(corpus, stemmer="none")
    res = search(idx, "zebra", k=10).orderBy("rank").collect()
    assert [r["docno"] for r in res] == ["a", "b"]
    assert [r["rank"] for r in res] == [0, 1]
    assert res[0]["score"] == res[1]["score"]


def test_oov_terms_dropped(index):
    res = search(index, "cat xyzzy", k=10).collect()
    # xyzzy is OOV -> silently dropped (reference _pisathon.cpp:498-505)
    assert {r["docno"] for r in res} == {"d1", "d3", "d4"} - {"d3"} | {"d1", "d4"}
    assert len(res) == 2


def test_stopword_query_time_only(index):
    # 'the' is indexed (df=2) but filtered from the query when stopwords on
    res_no_stop = search(index, "the cat", k=10, stopwords="none").collect()
    res_stop = search(index, "the cat", k=10, stopwords="lucene").collect()
    assert {r["docno"] for r in res_no_stop} == {"d1", "d2", "d4"}
    assert {r["docno"] for r in res_stop} == {"d1", "d4"}  # only 'cat' scored


def test_ranked_and(index):
    res = retrieve(index, [("q1", "cat mat")], mode="ranked_and", k=10).collect()
    assert {r["docno"] for r in res} == {"d1", "d4"}
    res2 = retrieve(index, [("q1", "cat dog")], mode="ranked_and", k=10).collect()
    assert res2 == []  # no doc has both


def test_k_cutoff(index):
    res = search(index, "cat mat", k=1).collect()
    assert len(res) == 1
    assert res[0]["rank"] == 0


def test_multi_query_batch(index):
    res = retrieve(index, [("q1", "cat"), ("q2", "dog sat"), ("q3", "nomatch")], k=5)
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {"q1", "q2"}
    assert {r["docno"] for r in by_q["q2"]} == {"d1", "d2"}  # sat:d1,d2 dog:d2
    for r in rows:
        assert r["query"] in {"cat", "dog sat", "nomatch"}


def test_assign_dense_ids_scalable(spark):
    df = spark.range(0, 1000).selectExpr("concat('k', lpad(cast(id as string), 5, '0')) as key")
    out = assign_dense_ids(df, ["key"], "nid", num_partitions=7)
    rows = out.orderBy("key").collect()
    assert [r["nid"] for r in rows] == list(range(1000))


def test_stemmed_index_matches(spark):
    corpus = spark.createDataFrame(
        [("d1", "running runs runner"), ("d2", "run")], schema="docno string, content string"
    )
    idx = build_logical_index(corpus, stemmer="porter2")
    lex = {r["term"]: r["df"] for r in idx.lexicon.collect()}
    assert lex == {"run": 2, "runner": 1}  # running/runs/run -> run; runner stays
    res = search(idx, "running", k=10).collect()
    assert {r["docno"] for r in res} == {"d1", "d2"}


def test_sha256_lineage(index):
    import hashlib

    rows = {r["docno"]: r["content_sha256"] for r in index.docmap.collect()}
    for docno, content in DOCS:
        assert rows[docno] == hashlib.sha256(content.encode()).hexdigest()

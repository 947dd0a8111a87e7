"""Frozen golden run (FIXTURES.md §5): the committed
tests/golden/bm25_topk_synth.json must be reproduced exactly by every engine
variant — this is the cross-round regression gate on corpus generation,
tokenization, stemming, docid assignment, scoring, and tie-breaking."""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bm25_topk_synth.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def built(spark, golden, tmp_path_factory):
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import build_index, load_index

    path = str(tmp_path_factory.mktemp("golden") / "idx")
    corpus = synth_code_corpus(spark, num_docs=golden["n_docs"], seed=golden["seed"])
    build_index(corpus, path, stemmer=golden["stemmer"], mode="overwrite")
    return load_index(spark, path)


def _check(golden, pdf):
    pdf = pdf.sort_values(["qid", "rank"]).reset_index(drop=True)
    rows = golden["rows"]
    assert len(pdf) == len(rows)
    assert pdf["qid"].tolist() == [r["qid"] for r in rows]
    assert pdf["docid"].tolist() == [r["docid"] for r in rows]
    assert pdf["docno"].tolist() == [r["docno"] for r in rows]
    assert pdf["rank"].tolist() == [r["rank"] for r in rows]
    np.testing.assert_allclose(
        pdf["score"].astype(float), [r["score"] for r in rows], atol=1e-3
    )


def test_pruned_kernel_matches_golden(spark, golden, built):
    from pyterrier_pisa_spark.operators.wand import retrieve_blockmax

    res = retrieve_blockmax(built, [tuple(q) for q in golden["queries"]],
                            k=golden["k"], include_query=False).toPandas()
    _check(golden, res)


def test_batch_kernel_matches_golden(spark, golden, built):
    from pyterrier_pisa_spark.operators.wand import retrieve_blockmax_batch

    res = retrieve_blockmax_batch(built, [tuple(q) for q in golden["queries"]],
                                  k=golden["k"], include_query=False).toPandas()
    _check(golden, res)


def test_exhaustive_plan_matches_golden(spark, golden, built):
    from pyterrier_pisa_spark.plans.pipeline import retrieve

    res = retrieve(built.as_logical(), [tuple(q) for q in golden["queries"]],
                   k=golden["k"], include_query=False).toPandas()
    _check(golden, res)

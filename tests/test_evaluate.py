"""Evaluation metrics vs hand-computed values (the measurement layer behind
the reference's golden-MAP tests, ``tests/test_vaswani.py:19-25``)."""

import pytest

from pyterrier_pisa_spark.operators.evaluate import (
    average_precision,
    mean_average_precision,
    ndcg_at_k,
    recall_at_k,
)


@pytest.fixture(scope="module")
def run_qrels(spark):
    # q1: relevant docs a, c; retrieved order a, b, c  -> AP = (1/1 + 2/3)/2
    # q2: relevant doc x; retrieved y, z (miss)        -> AP = 0
    run = spark.createDataFrame(
        [("q1", "a", 0), ("q1", "b", 1), ("q1", "c", 2),
         ("q2", "y", 0), ("q2", "z", 1)],
        schema="qid string, docno string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "c", 2), ("q2", "x", 1)],
        schema="qid string, docno string, label int",
    )
    return run, qrels


def test_average_precision(spark, run_qrels):
    run, qrels = run_qrels
    ap = {r["qid"]: r["ap"] for r in average_precision(run, qrels).collect()}
    assert ap["q1"] == pytest.approx((1.0 + 2 / 3) / 2)
    assert ap["q2"] == 0.0
    assert mean_average_precision(run, qrels) == pytest.approx(((1 + 2 / 3) / 2) / 2)


def test_ndcg(spark, run_qrels):
    run, qrels = run_qrels
    import math

    nd = {r["qid"]: r["ndcg"] for r in ndcg_at_k(run, qrels, k=3).collect()}
    # q1: DCG = 1/log2(2) + 2/log2(4); IDCG = 2/log2(2) + 1/log2(3)
    dcg = 1 / math.log2(2) + 2 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    assert nd["q1"] == pytest.approx(dcg / idcg)
    assert nd["q2"] == 0.0


def test_recall(spark, run_qrels):
    run, qrels = run_qrels
    rec = {r["qid"]: r["recall"] for r in recall_at_k(run, qrels, k=2).collect()}
    assert rec["q1"] == pytest.approx(0.5)  # only 'a' within top-2
    assert rec["q2"] == 0.0

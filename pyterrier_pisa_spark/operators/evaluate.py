"""IR effectiveness metrics (MAP, nDCG@k, recall@k) as DataFrame plans —
the measurement layer behind the reference's golden-MAP test strategy
(``tests/test_vaswani.py:19-25`` evaluates runs against qrels with MAP).

run:   (qid, docno, rank[, score])   — rank 0-based, dense per qid
qrels: (qid, docno, label)           — label > 0 means relevant
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def average_precision(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """(qid, ap): AP = sum over relevant retrieved of P@(rank+1) / num_rel.
    Queries with no relevant docs in qrels are omitted (convention of
    trec_eval, which the reference's pt.Evaluate follows)."""
    rel = qrels.filter(F.col("label") > 0).select("qid", "docno", F.lit(1).alias("is_rel"))
    nrel = rel.groupBy("qid").agg(F.count("*").alias("num_rel"))
    j = run.join(rel, ["qid", "docno"], "left").fillna({"is_rel": 0})
    w = Window.partitionBy("qid").orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    j = j.withColumn("cum_rel", F.sum("is_rel").over(w))
    j = j.withColumn("p_at_k", F.col("cum_rel") / (F.col("rank") + 1))
    ap = (
        j.filter(F.col("is_rel") == 1)
        .groupBy("qid")
        .agg(F.sum("p_at_k").alias("sum_p"))
        .join(nrel, "qid")
        .select("qid", (F.col("sum_p") / F.col("num_rel")).alias("ap"))
    )
    # queries with relevant docs but none retrieved -> AP 0
    return nrel.join(ap, "qid", "left").fillna({"ap": 0.0}).select("qid", "ap")


def mean_average_precision(run: DataFrame, qrels: DataFrame) -> float:
    row = average_precision(run, qrels).agg(F.avg("ap").alias("map")).collect()[0]
    return float(row["map"]) if row["map"] is not None else 0.0


def ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, ndcg): graded labels; DCG = sum label_i / log2(rank+2),
    IDCG over labels sorted descending."""
    g = qrels.filter(F.col("label") > 0)
    j = run.filter(F.col("rank") < k).join(g, ["qid", "docno"], "inner")
    dcg = j.groupBy("qid").agg(
        F.sum(F.col("label") / F.log2(F.col("rank") + 2)).alias("dcg")
    )
    wi = Window.partitionBy("qid").orderBy(F.col("label").desc(), F.col("docno").asc())
    ideal = (
        g.withColumn("irank", F.row_number().over(wi) - 1)
        .filter(F.col("irank") < k)
        .groupBy("qid")
        .agg(F.sum(F.col("label") / F.log2(F.col("irank") + 2)).alias("idcg"))
    )
    return (
        ideal.join(dcg, "qid", "left").fillna({"dcg": 0.0})
        .select("qid", (F.col("dcg") / F.col("idcg")).alias("ndcg"))
    )


def recall_at_k(run: DataFrame, qrels: DataFrame, k: int = 1000) -> DataFrame:
    rel = qrels.filter(F.col("label") > 0).select("qid", "docno")
    nrel = rel.groupBy("qid").agg(F.count("*").alias("num_rel"))
    got = (
        run.filter(F.col("rank") < k).join(rel, ["qid", "docno"], "inner")
        .groupBy("qid").agg(F.count("*").alias("num_got"))
    )
    return (
        nrel.join(got, "qid", "left").fillna({"num_got": 0})
        .select("qid", (F.col("num_got") / F.col("num_rel")).alias("recall"))
    )

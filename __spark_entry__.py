"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (BM25 top-k over the sf0.001
documents corpus through the full index-build + retrieval pipeline);
``queries()``/``oracle_sql()`` expose one entry per implemented operator
(SURVEY.md §2), checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over /root/testdata/sf0.001
    documents and answer the embedded query set with exhaustive BM25 top-k."""
    from pyterrier_pisa_spark.plans.entry_queries import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyterrier_pisa_spark.plans.entry_queries import IR_QUERIES

    from pyterrier_pisa_spark.plans.entry_pipeline import PIPELINE_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(IR_QUERIES)
    out.update(PIPELINE_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from pyterrier_pisa_spark.plans.entry_pipeline import PIPELINE_ORACLES
    from pyterrier_pisa_spark.plans.entry_queries import ORACLES

    out = dict(ORACLES)
    out.update(PIPELINE_ORACLES)
    return out

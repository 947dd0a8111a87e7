"""pyterrier_pisa_spark — a PySpark-native full-text indexing + BM25
retrieval engine with the capabilities of terrierteam/pyterrier_pisa,
re-designed Spark-first (DataFrames, Arrow pandas UDFs, parquet tables)
rather than ported from PISA's C++ pipeline. See SURVEY.md for the full
structural cross-walk to the reference.

Quick start::

    from pyterrier_pisa_spark import build_index, load_index, retrieve_blockmax
    build_index(corpus_df, "/path/idx", stemmer="porter2")
    idx = load_index(spark, "/path/idx")
    results = retrieve_blockmax(idx, [("q1", "hello worlds")], k=1000)
"""

from .functions.tokenizer import DictTokeniser
from .functions.tokenizer import tokenize_text as tokenize
from .operators.serve import LocalSearcher, ShardedLocalSearcher
from .operators.wand import retrieve_blockmax
from .plans.api import (
    PISA_INDEX_DEFAULTS,
    PisaIndexEncoding,
    PisaIndexingMode,
    PisaQueryAlgorithm,
    PisaScorer,
    PisaSparkIndex,
    PisaStemmer,
    PisaStopwords,
    SparkIndexer,
    SparkRetriever,
)
from .plans.pipeline import (
    LogicalIndex,
    build_logical_index,
    build_logical_index_toks,
    retrieve,
    retrieve_toks,
    search,
)
from .sources.index_store import PersistedIndex, build_index, load_index

__version__ = "0.1.0"


def log_level(on: bool = True) -> None:
    """Toggle engine logging (reference ``log_level``, ``__init__.py:124-125``
    — there a flag into the native engine's stderr logging). Here the engine
    IS Spark, so the switch sets the active session's log level: INFO when
    on, ERROR when off. No-op when no session is active."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        spark.sparkContext.setLogLevel("INFO" if on else "ERROR")

__all__ = [
    "DictTokeniser",
    "LocalSearcher",
    "LogicalIndex",
    "PISA_INDEX_DEFAULTS",
    "PersistedIndex",
    "PisaIndexEncoding",
    "PisaIndexingMode",
    "PisaQueryAlgorithm",
    "PisaScorer",
    "PisaSparkIndex",
    "PisaStemmer",
    "PisaStopwords",
    "ShardedLocalSearcher",
    "SparkIndexer",
    "SparkRetriever",
    "build_index",
    "build_logical_index",
    "log_level",
    "build_logical_index_toks",
    "load_index",
    "retrieve",
    "retrieve_blockmax",
    "retrieve_toks",
    "search",
    "tokenize",
    "__version__",
]

"""Parallelism-invariance: the index built at different parallelism levels
(the sandbox stand-in for different cluster sizes, BASELINE.json north_rule)
must be CONTENT-identical — docids, lexicon ids, decoded postings, scores.
This also guards the ReusedExchange assumption inside assign_dense_ids."""

import pytest
from pyspark.sql import functions as F

from pyterrier_pisa_spark.operators.wand import retrieve_blockmax
from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
from pyterrier_pisa_spark.sources.index_store import build_index, load_index

N = 700
QUERIES = [("q1", "parse index query"), ("q2", "def return if"), ("q3", "merge shard")]


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("det")
    paths = {}
    for np_ in (3, 16):
        corpus = synth_code_corpus(spark, num_docs=N, seed=21, num_partitions=np_)
        p = str(root / f"idx_{np_}")
        build_index(corpus, p, stemmer="porter2", block_size=64, num_partitions=np_,
                    mode="overwrite")
        paths[np_] = p
    return paths


def _pdf(df, keys):
    return df.toPandas().sort_values(keys).reset_index(drop=True)


def test_docmap_identical(spark, two_indexes):
    a = load_index(spark, two_indexes[3])
    b = load_index(spark, two_indexes[16])
    pa = _pdf(a.docmap, ["docid"])
    pb = _pdf(b.docmap, ["docid"])
    assert pa.equals(pb), "docid assignment differs across parallelism"


def test_lexicon_identical(spark, two_indexes):
    a = load_index(spark, two_indexes[3])
    b = load_index(spark, two_indexes[16])
    cols = ["term", "term_id", "df", "cf", "max_score"]
    pa = _pdf(a.lexicon.select(*cols), ["term_id"])
    pb = _pdf(b.lexicon.select(*cols), ["term_id"])
    assert pa.drop(columns=["max_score"]).equals(pb.drop(columns=["max_score"]))
    import numpy as np

    np.testing.assert_allclose(pa["max_score"], pb["max_score"], rtol=1e-12)


def test_postings_identical(spark, two_indexes):
    a = load_index(spark, two_indexes[3])
    b = load_index(spark, two_indexes[16])
    cols = ["term_id", "docid", "tf", "doclen"]
    pa = _pdf(a.flat_tf().select(*cols), ["term_id", "docid"])
    pb = _pdf(b.flat_tf().select(*cols), ["term_id", "docid"])
    assert pa.equals(pb), "decoded postings differ across parallelism"
    # block layout identical too (same block boundaries)
    bl = ["term_id", "block_id", "count", "docid_first", "docid_last"]
    ba = _pdf(a.blocks.select(*bl), ["term_id", "block_id"])
    bb = _pdf(b.blocks.select(*bl), ["term_id", "block_id"])
    assert ba.equals(bb)


def test_results_identical(spark, two_indexes):
    a = load_index(spark, two_indexes[3])
    b = load_index(spark, two_indexes[16])
    ra = retrieve_blockmax(a, QUERIES, k=50, include_query=False).toPandas()
    rb = retrieve_blockmax(b, QUERIES, k=50, include_query=False).toPandas()
    ra = ra.sort_values(["qid", "rank"]).reset_index(drop=True)
    rb = rb.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert ra["docid"].tolist() == rb["docid"].tolist()
    assert ra["docno"].tolist() == rb["docno"].tolist()
    import numpy as np

    np.testing.assert_allclose(ra["score"], rb["score"], rtol=1e-6)

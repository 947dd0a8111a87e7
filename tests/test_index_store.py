"""Persisted index: build phases, block format invariants, checkpoint-resume,
lineage, and the block-max kernel self-oracle (pruned ≡ exhaustive — the
contract from the reference's variants matrix, ``tests/test_variants.py``)."""

import json
import os
import shutil

import numpy as np
import pytest

from pyterrier_pisa_spark.operators.wand import retrieve_blockmax
from pyterrier_pisa_spark.plans.pipeline import build_logical_index, retrieve
from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
from pyterrier_pisa_spark.sources.index_store import build_index, load_index

N_DOCS = 400
BLOCK = 32  # small block size to exercise multi-block terms + partial merges
CHUNK = 64  # small chunk span to exercise boundary-partial merging

QUERIES = [
    ("q1", "parse index query"),
    ("q2", "def return if"),          # hot zipf-head terms, many blocks
    ("q3", "get_engine var399 zzz"),  # rare + OOV mix
    ("q4", "merge shard"),
    ("q5", "nonexistenttermxyz"),     # fully OOV
]


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "synth")
    corpus = synth_code_corpus(spark, num_docs=N_DOCS, seed=7)
    build_index(corpus, path, stemmer="porter2", block_size=BLOCK, chunk_span=CHUNK,
                mode="overwrite")
    return path


def test_meta_and_phases(spark, index_path):
    meta = json.load(open(os.path.join(index_path, "meta.json")))
    assert meta["stats"]["num_docs"] == N_DOCS
    assert meta["block_size"] == BLOCK
    for phase in ("tf", "lexicon", "postings", "maxscore"):
        assert os.path.exists(os.path.join(index_path, "_phases", f"{phase}.done")), phase


def test_block_invariants(spark, index_path):
    """Chunk-local block contract: within a (term, chunk) every block is full
    except the last; block ids strictly increase with docid; all blocks lie
    inside one chunk."""
    idx = load_index(spark, index_path)
    rows = idx.blocks.collect()
    assert rows
    by_tc = {}
    for r in rows:
        chunk_first = r["docid_first"] // CHUNK
        chunk_last = r["docid_last"] // CHUNK
        assert chunk_first == chunk_last, "block spans a chunk boundary"
        by_tc.setdefault((r["term_id"], chunk_first), []).append(r)
        assert 1 <= r["count"] <= BLOCK
        assert r["docid_first"] <= r["docid_last"]
        assert np.isfinite(r["block_max_score"])
    for (term_id, chunk), blocks in by_tc.items():
        blocks.sort(key=lambda r: r["block_id"])
        for r in blocks[:-1]:
            assert r["count"] == BLOCK, (term_id, chunk, r["block_id"], r["count"])
        for a, b in zip(blocks, blocks[1:]):
            assert a["docid_last"] < b["docid_first"]
            assert a["block_id"] < b["block_id"]
    # and globally per term: block_id order == docid order
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term_id"], []).append(r)
    for term_id, blocks in by_term.items():
        blocks.sort(key=lambda r: r["block_id"])
        for a, b in zip(blocks, blocks[1:]):
            assert a["docid_last"] < b["docid_first"]


def test_flat_tf_roundtrip_matches_logical(spark, index_path):
    """Decoded persisted postings == freshly built logical tf (the format
    oracle: compression is lossless)."""
    idx = load_index(spark, index_path)
    corpus = synth_code_corpus(spark, num_docs=N_DOCS, seed=7)
    logical = build_logical_index(corpus, stemmer="porter2")
    flat = idx.as_logical().tf.select("docid", "term", "tf", "doclen")
    fresh = logical.tf.select("docid", "term", "tf", "doclen")
    assert flat.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(flat).count() == 0


def test_lexicon_maxscore_is_true_max(spark, index_path):
    """Stored block maxes are df-independent REST factors
    (block_max_kind='bm25_rest'); the lexicon's absolute max_score must equal
    clamped_idf(df) * max(rest) per term."""
    import math

    idx = load_index(spark, index_path)
    assert idx.meta["block_max_kind"] == "bm25_rest"
    n = idx.stats["num_docs"]
    blocks_max = idx.blocks.groupBy("term_id").agg(
        {"block_max_score": "max"}).withColumnRenamed("max(block_max_score)", "bmax")
    joined = idx.lexicon.join(blocks_max, "term_id").collect()
    for r in joined:
        idf = max(1e-6, math.log((n - r["df"] + 0.5) / (r["df"] + 0.5)))
        assert r["max_score"] == pytest.approx(idf * r["bmax"], rel=1e-12)


def test_blockmax_kernel_matches_exhaustive(spark, index_path):
    """THE self-oracle: pruned kernel ≡ exhaustive DataFrame plan, rank and
    score identical (tolerance = float addition order)."""
    idx = load_index(spark, index_path)
    k = 25
    pruned = retrieve_blockmax(idx, QUERIES, k=k, include_query=False).toPandas()
    logical = idx.as_logical()
    logical.meta["stemmer"] = "porter2"
    exh = retrieve(logical, QUERIES, k=k, include_query=False).toPandas()
    assert len(pruned) == len(exh)
    p = pruned.sort_values(["qid", "rank"]).reset_index(drop=True)
    e = exh.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert p["qid"].tolist() == e["qid"].tolist()
    assert p["docid"].tolist() == e["docid"].tolist(), "rank-identity violated"
    np.testing.assert_allclose(p["score"], e["score"], rtol=1e-5)
    assert (p["rank"] == e["rank"]).all()
    # sanity: queries with matches actually return rows
    assert set(p["qid"]) == {"q1", "q2", "q3", "q4"}


def test_blockmax_conjunctive_matches_exhaustive(spark, index_path):
    idx = load_index(spark, index_path)
    pruned = retrieve_blockmax(idx, QUERIES[:4], k=30, conjunctive=True,
                               include_query=False).toPandas()
    logical = idx.as_logical()
    exh = retrieve(logical, QUERIES[:4], k=30, mode="ranked_and", include_query=False).toPandas()
    p = pruned.sort_values(["qid", "rank"]).reset_index(drop=True)
    e = exh.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert p["docid"].tolist() == e["docid"].tolist()
    np.testing.assert_allclose(p["score"], e["score"], rtol=1e-5)


def test_resume_skips_completed_phases(spark, tmp_path):
    path = str(tmp_path / "resume_idx")
    corpus = synth_code_corpus(spark, num_docs=120, seed=3)
    build_index(corpus, path, block_size=BLOCK, chunk_span=CHUNK, mode="overwrite")
    # simulate a crash after the postings phase: delete downstream artifacts
    shutil.rmtree(os.path.join(path, "term_stats"))
    os.remove(os.path.join(path, "_phases", "maxscore.done"))
    os.remove(os.path.join(path, "meta.json"))
    before = open(os.path.join(path, "_phases", "postings.done")).read()
    build_index(corpus, path, block_size=BLOCK, chunk_span=CHUNK, mode="resume")
    after = open(os.path.join(path, "_phases", "postings.done")).read()
    assert before == after, "completed postings phase must not be recomputed"
    idx = load_index(spark, path)
    assert idx.lexicon.filter("max_score is null").count() == 0


def test_create_mode_errors_if_exists(spark, tmp_path):
    path = str(tmp_path / "exists_idx")
    corpus = synth_code_corpus(spark, num_docs=30, seed=1)
    build_index(corpus, path, mode="overwrite", block_size=BLOCK)
    with pytest.raises(FileExistsError):
        build_index(corpus, path, mode="create", block_size=BLOCK)


def test_metrics_written(spark, index_path):
    m = spark.read.parquet(os.path.join(index_path, "metrics"))
    phases = {r["phase"] for r in m.collect()}
    assert {"tf", "lexicon", "postings"} <= phases


def test_sha256_lineage_persisted(spark, index_path):
    idx = load_index(spark, index_path)
    from pyspark.sql import functions as F

    corpus = synth_code_corpus(spark, num_docs=N_DOCS, seed=7)
    src = corpus.withColumn("docno", F.concat_ws("", "repo", F.lit("/"), "path", F.lit("@"), "commit")) \
                .select("docno", F.sha2("content", 256).alias("expect"))
    j = idx.docmap.join(src, "docno")
    assert j.count() == N_DOCS
    assert j.filter(F.col("content_sha256") != F.col("expect")).count() == 0


def test_quantize_index_precompute_impact(spark, tmp_path):
    """precompute_impact (B9): quantized index's integer dot-product results
    must equal hand-quantized BM25 over the flat postings (same linear
    quantizer: max(1, ceil(partial / global_max * 255)))."""
    import numpy as np

    from pyterrier_pisa_spark.operators import score as S
    from pyterrier_pisa_spark.operators.wand import retrieve_blockmax_batch
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import (build_index, load_index,
                                                          quantize_index)

    src = str(tmp_path / "src")
    corpus = synth_code_corpus(spark, num_docs=300, seed=9)
    build_index(corpus, src, stemmer="porter2", block_size=32, chunk_span=64,
                mode="overwrite")
    idx = load_index(spark, src)
    dst = str(tmp_path / "qidx")
    meta = quantize_index(idx, dst, scorer="bm25", bits=8)
    assert meta["scorer"]["name"] == "quantized"
    gmax = meta["quantized_from"]["global_max"]
    qidx = load_index(spark, dst)

    queries = [("q1", "parse index query"), ("q2", "def return")]
    got = retrieve_blockmax_batch(qidx, queries, k=20, scorer="quantized",
                                  include_query=False, cast_float32=False).toPandas()

    # hand-computed expectation from the SOURCE index's flat postings
    flat = idx.flat_tf().join(idx.lexicon.select("term_id", "term", "df"), "term_id").toPandas()
    stats = idx.stats
    part = S.np_partial_fn("bm25", stats, 0.9, 0.4)
    flat["impact"] = np.maximum(1.0, np.ceil(
        part(flat["tf"].to_numpy(np.float64), flat["doclen"].to_numpy(np.float64),
             flat["df"].to_numpy(np.float64)) / gmax * 255.0)).astype(np.int64)
    from pyterrier_pisa_spark.functions.porter2 import stem
    for qid, qtext in queries:
        terms = {stem(t) for t in qtext.split()}
        sub = flat[flat["term"].isin(terms)]
        exp = sub.groupby("docid")["impact"].sum().sort_values(ascending=False)
        g = got[got["qid"] == qid].sort_values("rank")
        kk = min(20, len(exp))
        assert len(g) == kk
        # scores must match exactly per docid (integer arithmetic)
        exp_d = dict(exp)
        for r in g.itertuples():
            assert exp_d[r.docid] == int(r.score), (qid, r.docid)


def test_quantize_index_rejects_empty(spark, tmp_path):
    import pytest as _pytest

    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import (build_index, load_index,
                                                          quantize_index)

    src = str(tmp_path / "srcq")
    corpus = synth_code_corpus(spark, num_docs=50, seed=2)
    build_index(corpus, src, stemmer="none", mode="overwrite")
    idx = load_index(spark, src)
    # valid index quantizes fine; degenerate gmax raises a clear error
    meta = quantize_index(idx, str(tmp_path / "okq"))
    assert meta["quantized_from"]["bits"] == 8


def test_dataset_registry_roundtrip(spark, tmp_path):
    """S8: register a built index under a name, load it back by name."""
    import pytest as _pytest

    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import (build_index, from_dataset,
                                                          register_dataset)

    path = str(tmp_path / "regidx")
    corpus = synth_code_corpus(spark, num_docs=60, seed=4)
    build_index(corpus, path, stemmer="none", mode="overwrite")
    reg = str(tmp_path / "registry")
    register_dataset("unit/regidx", path, registry_dir=reg)
    idx = from_dataset(spark, "unit/regidx", registry_dir=reg)
    assert idx.num_docs() == 60
    with _pytest.raises(KeyError, match="not registered"):
        from_dataset(spark, "nope", registry_dir=reg)
    with _pytest.raises(FileNotFoundError):
        register_dataset("bad", str(tmp_path / "missing"), registry_dir=reg)


@pytest.mark.parametrize("enc", ["bytepack", "bitpack"])
def test_encoding_index_rank_identical(spark, tmp_path, enc):
    """B8 encoding parity: a bytepack/bitpack-encoded index must return rank-
    AND score-identical results to the default varint index (encodings are
    rank-preserving storage variants, reference index_encoding semantics)."""
    import numpy as np

    from pyterrier_pisa_spark.operators.wand import (retrieve_blockmax,
                                                     retrieve_blockmax_batch)
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus

    corpus = synth_code_corpus(spark, num_docs=300, seed=6)
    pv = str(tmp_path / "v_idx")
    pb = str(tmp_path / f"{enc}_idx")
    build_index(corpus, pv, stemmer="porter2", block_size=32, chunk_span=64,
                mode="overwrite")
    build_index(corpus, pb, stemmer="porter2", block_size=32, chunk_span=64,
                mode="overwrite", encoding=enc)
    iv, ib = load_index(spark, pv), load_index(spark, pb)
    assert ib.meta["encoding"] == enc
    qs = [("q1", "parse index query"), ("q2", "def return")]
    for fn in (retrieve_blockmax, retrieve_blockmax_batch):
        a = fn(iv, qs, k=20, include_query=False).toPandas().sort_values(
            ["qid", "rank"]).reset_index(drop=True)
        b = fn(ib, qs, k=20, include_query=False).toPandas().sort_values(
            ["qid", "rank"]).reset_index(drop=True)
        assert a["docid"].tolist() == b["docid"].tolist()
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-12)
    # flat view decodes identically too
    fa = iv.flat_tf().toPandas().sort_values(["term_id", "docid"]).reset_index(drop=True)
    fb = ib.flat_tf().toPandas().sort_values(["term_id", "docid"]).reset_index(drop=True)
    assert fa.equals(fb)


def test_quantize_index_references_tables_not_copies(spark, tmp_path):
    """quantize_index must NOT driver-copy docmap/fwd/lexicon into the
    destination (object-store bandwidth hazard): the new meta carries table
    REFERENCES and load_index resolves them, so retrieval + corpus-facing
    accessors work with only postings/term_stats materialized locally."""
    import os

    from pyterrier_pisa_spark.operators.wand import retrieve_blockmax_batch
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import (build_index, load_index,
                                                          quantize_index)

    src = str(tmp_path / "src_tr")
    corpus = synth_code_corpus(spark, num_docs=120, seed=4)
    build_index(corpus, src, stemmer="none", mode="overwrite")
    idx = load_index(spark, src)
    dst = str(tmp_path / "q_tr")
    meta = quantize_index(idx, dst)
    # no copied source tables on disk, references recorded instead
    for sub in ("fwd", "lexicon", "docmap"):
        assert not os.path.exists(os.path.join(dst, sub)), sub
    assert meta["table_refs"]["lexicon"] == os.path.abspath(os.path.join(src, "lexicon"))
    qidx = load_index(spark, dst)
    assert qidx.num_docs() == 120
    got = retrieve_blockmax_batch(qidx, [("q1", "def return")], k=5,
                                  scorer="quantized", include_query=False)
    rows = got.collect()
    assert rows and all(r["docno"] for r in rows)

"""CIFF roundtrip (reference ``tests/test_ciff.py:8-17``: results frame-equal
before/after export->import). Also pins the wire-format primitives."""

import numpy as np
import pytest

from pyterrier_pisa_spark.sources.ciff import (
    CiffHeader,
    decode_doc_record,
    decode_postings_list,
    encode_doc_record,
    encode_postings_list,
    export_ciff,
    import_ciff,
)


def test_wire_header_roundtrip():
    h = CiffHeader(version=1, num_postings_lists=42, num_docs=7, total_postings_lists=42,
                   total_docs=7, total_terms_in_collection=1234,
                   average_doclength=17.25, description="unit test")
    h2 = CiffHeader.decode(h.encode())
    assert h2 == h


def test_wire_postings_roundtrip():
    msg = encode_postings_list("spark", 3, 9, [2, 10, 11], [4, 1, 4])
    term, df, cf, docids, tfs = decode_postings_list(msg)
    assert (term, df, cf) == ("spark", 3, 9)
    assert docids == [2, 10, 11]  # gaps 2,8,1 decoded back
    assert tfs == [4, 1, 4]


def test_wire_docrecord_roundtrip():
    docid, docno, dl = decode_doc_record(encode_doc_record(5, "org1/a.py@deadbeef", 120))
    assert (docid, docno, dl) == (5, "org1/a.py@deadbeef", 120)


def test_ciff_index_roundtrip(spark, tmp_path):
    from pyterrier_pisa_spark.operators.wand import retrieve_blockmax
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import build_index, load_index

    src_path = str(tmp_path / "src_idx")
    corpus = synth_code_corpus(spark, num_docs=200, seed=5)
    build_index(corpus, src_path, stemmer="porter2", block_size=32, mode="overwrite")
    idx = load_index(spark, src_path)

    ciff_file = str(tmp_path / "index.ciff")
    info = export_ciff(idx, ciff_file)
    assert info["num_docs"] == 200
    assert info["postings_lists"] == idx.num_terms()

    imp_path = str(tmp_path / "imported_idx")
    meta = import_ciff(spark, ciff_file, imp_path, stemmer="none", block_size=32)
    idx2 = load_index(spark, imp_path)
    assert meta["stats"]["num_docs"] == 200

    # lexicon identical (term, df, cf and dense sorted ids)
    a = idx.lexicon.select("term", "term_id", "df", "cf").toPandas().sort_values("term_id").reset_index(drop=True)
    b = idx2.lexicon.select("term", "term_id", "df", "cf").toPandas().sort_values("term_id").reset_index(drop=True)
    assert a.equals(b)
    # postings identical after decode
    fa = idx.flat_tf().toPandas().sort_values(["term_id", "docid"]).reset_index(drop=True)
    fb = idx2.flat_tf().toPandas().sort_values(["term_id", "docid"]).reset_index(drop=True)
    assert fa.equals(fb)

    # retrieval frame-equal (the reference's roundtrip assertion). The
    # imported index is stemmer='none' (its terms arrive already stemmed),
    # so use porter2-invariant query words to keep both parses identical.
    queries = [("c1", "index shard"), ("c2", "def return")]
    r1 = retrieve_blockmax(idx, queries, k=15, include_query=False).toPandas()
    r2 = retrieve_blockmax(idx2, queries, k=15, include_query=False).toPandas()
    r1 = r1.sort_values(["qid", "rank"]).reset_index(drop=True)
    r2 = r2.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert r1["docid"].tolist() == r2["docid"].tolist()
    assert r1["docno"].tolist() == r2["docno"].tolist()
    np.testing.assert_allclose(r1["score"], r2["score"], rtol=1e-6)


def test_write_varint_rejects_negative():
    from pyterrier_pisa_spark.sources.ciff import _write_varint

    with pytest.raises(ValueError, match="non-negative"):
        _write_varint(bytearray(), -1)
    # reachable path: non-ascending docids -> negative gap
    with pytest.raises(ValueError):
        encode_postings_list("t", 2, 2, [10, 3], [1, 1])


def test_import_ciff_empty_file_raises(spark, tmp_path):
    p = tmp_path / "empty.ciff"
    p.write_bytes(b"")
    with pytest.raises(ValueError, match="empty or truncated header"):
        import_ciff(spark, str(p), str(tmp_path / "idx"))


def test_import_ciff_truncated_raises(spark, tmp_path):
    from pyterrier_pisa_spark.sources.ciff import CiffHeader, _write_delimited

    p = tmp_path / "trunc.ciff"
    with open(p, "wb") as fh:
        _write_delimited(fh, CiffHeader(num_postings_lists=5, num_docs=3).encode())
        _write_delimited(fh, encode_postings_list("a", 1, 1, [0], [1]))
    with pytest.raises(ValueError, match="truncated CIFF"):
        import_ciff(spark, str(p), str(tmp_path / "idx"))


def test_import_ciff_bounded_batches(spark, tmp_path):
    """batch_rows smaller than the postings count forces multiple incremental
    flushes — the driver-memory-bounded path — and must produce the same
    index tables as a one-shot import."""
    from pyterrier_pisa_spark.sources.ciff import CiffHeader, _write_delimited

    p = tmp_path / "multi.ciff"
    docs = [(0, "d0", 4), (1, "d1", 2), (2, "d2", 3)]
    with open(p, "wb") as fh:
        _write_delimited(fh, CiffHeader(
            num_postings_lists=3, num_docs=3, total_postings_lists=3, total_docs=3,
            total_terms_in_collection=9, average_doclength=3.0).encode())
        _write_delimited(fh, encode_postings_list("aa", 2, 3, [0, 2], [2, 1]))
        _write_delimited(fh, encode_postings_list("bb", 3, 4, [0, 1, 2], [1, 1, 2]))
        _write_delimited(fh, encode_postings_list("cc", 2, 2, [0, 1], [1, 1]))
        for d, dn, dl in docs:
            _write_delimited(fh, encode_doc_record(d, dn, dl))
    meta = import_ciff(spark, str(p), str(tmp_path / "idx"), batch_rows=2)
    assert meta["stats"]["num_docs"] == 3
    tf = spark.read.parquet(str(tmp_path / "idx" / "tf")).toPandas()
    assert len(tf) == 7
    got = {(r.docid, r.term): (r.tf, r.doclen) for r in tf.itertuples()}
    assert got[(0, "aa")] == (2, 4)
    assert got[(2, "bb")] == (2, 3)
    assert got[(1, "cc")] == (1, 2)


GOLDEN_DOCS = [("d1", "the quick brown fox jumps"),
               ("d2", "pack my box with five dozen jugs"),
               ("d3", "the lazy dog sleeps"),
               ("d4", "brown jugs pack the box"),
               ("d5", "five quick foxes"),
               ("d6", "sphinx of black quartz judge my vow")]


def test_ciff_export_matches_frozen_golden(spark, tmp_path):
    """Wire-format drift guard: exporting the frozen 6-doc corpus must
    reproduce tests/golden/tiny.ciff BYTE FOR BYTE (the self-consistency
    roundtrip alone would not notice a symmetric encode/decode change), and
    importing the golden must rebuild the same lexicon/postings."""
    import os

    from pyterrier_pisa_spark.sources.index_store import build_index, load_index

    golden_path = os.path.join(os.path.dirname(__file__), "golden", "tiny.ciff")
    golden = open(golden_path, "rb").read()

    corpus = spark.createDataFrame(GOLDEN_DOCS, schema="docno string, content string")
    src = str(tmp_path / "gsrc")
    build_index(corpus, src, stemmer="porter2", block_size=4, chunk_span=4,
                mode="overwrite")
    out = str(tmp_path / "out.ciff")
    export_ciff(load_index(spark, src), out, description="golden-v1")
    assert open(out, "rb").read() == golden

    # the golden file must also IMPORT to the expected index
    dst = str(tmp_path / "gidx")
    import_ciff(spark, golden_path, dst)
    idx = load_index(spark, dst)
    assert idx.num_docs() == 6
    lex = {r["term"]: (r["df"], r["cf"]) for r in idx.lexicon.collect()}
    assert lex["brown"] == (2, 2)
    assert lex["the"] == (3, 3)
    flat = idx.flat_tf().toPandas()
    assert len(flat) == sum(df for df, _ in lex.values())

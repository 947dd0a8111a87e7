"""CIFF (Common Index File Format) import/export — reference S6/S7
(``PisaIndex.from_ciff`` / ``to_ciff``, reference ``__init__.py:315-369``).

CIFF is the public interchange format of Lin et al., "Supporting
Interoperability Between Open-Source Search Engines with the Common Index
File Format" (SIGIR 2020; spec at github.com/osirrc/ciff): a sequence of
length-delimited protobuf messages —

    Header
    num_postings_lists x PostingsList   (terms in lexicographic order;
                                         posting docids delta-encoded:
                                         first absolute, then gaps)
    num_docs x DocRecord

Since no protobuf library ships in this environment, this module implements
the tiny subset of the protobuf wire format those three fixed messages need
(varint fields, length-delimited strings/submessages, one double) from the
public wire-format spec. Field numbers follow the published
common-index-file-format .proto.

Import reuses the build pipeline's phase protocol (like streaming
compaction): parsed postings land as the tf/docmap shard tables, then phases
2–4 rebuild lexicon/blocks/maxscore — so an imported index is
indistinguishable from a built one.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

# ----------------------------------------------------------- wire primitives

def _write_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _tag(field_no: int, wire: int) -> int:
    return (field_no << 3) | wire


def _put_varint_field(out: bytearray, field_no: int, v: int) -> None:
    if v == 0:
        return  # proto3 default omitted
    _write_varint(out, _tag(field_no, 0))
    _write_varint(out, v)


def _put_bytes_field(out: bytearray, field_no: int, data: bytes) -> None:
    _write_varint(out, _tag(field_no, 2))
    _write_varint(out, len(data))
    out.extend(data)


def _put_double_field(out: bytearray, field_no: int, v: float) -> None:
    if v == 0.0:
        return
    _write_varint(out, _tag(field_no, 1))
    out.extend(struct.pack("<d", v))


def _parse_fields(buf: bytes):
    """Yield (field_no, wire_type, value) over one message's bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field_no, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
        elif wire == 1:
            v = struct.unpack("<d", buf[pos:pos + 8])[0]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            v = struct.unpack("<f", buf[pos:pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field_no, wire, v


# ------------------------------------------------------------- CIFF messages

@dataclass
class CiffHeader:
    version: int = 1
    num_postings_lists: int = 0
    num_docs: int = 0
    total_postings_lists: int = 0
    total_docs: int = 0
    total_terms_in_collection: int = 0
    average_doclength: float = 0.0
    description: str = ""

    def encode(self) -> bytes:
        out = bytearray()
        _put_varint_field(out, 1, self.version)
        _put_varint_field(out, 2, self.num_postings_lists)
        _put_varint_field(out, 3, self.num_docs)
        _put_varint_field(out, 4, self.total_postings_lists)
        _put_varint_field(out, 5, self.total_docs)
        _put_varint_field(out, 6, self.total_terms_in_collection)
        _put_double_field(out, 7, self.average_doclength)
        if self.description:
            _put_bytes_field(out, 8, self.description.encode())
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "CiffHeader":
        h = cls()
        for fno, _w, v in _parse_fields(buf):
            if fno == 1: h.version = v
            elif fno == 2: h.num_postings_lists = v
            elif fno == 3: h.num_docs = v
            elif fno == 4: h.total_postings_lists = v
            elif fno == 5: h.total_docs = v
            elif fno == 6: h.total_terms_in_collection = v
            elif fno == 7: h.average_doclength = v
            elif fno == 8: h.description = v.decode()
        return h


def _encode_posting(docid_gap: int, tf: int) -> bytes:
    out = bytearray()
    _put_varint_field(out, 1, docid_gap)
    _put_varint_field(out, 2, tf)
    return bytes(out)


def encode_postings_list(term: str, df: int, cf: int, docids, tfs) -> bytes:
    out = bytearray()
    _put_bytes_field(out, 1, term.encode())
    _put_varint_field(out, 2, df)
    _put_varint_field(out, 3, cf)
    prev = 0
    for d, t in zip(docids, tfs):
        _put_bytes_field(out, 4, _encode_posting(int(d) - prev, int(t)))
        prev = int(d)
    return bytes(out)


def decode_postings_list(buf: bytes) -> tuple[str, int, int, list[int], list[int]]:
    term, df, cf = "", 0, 0
    docids: list[int] = []
    tfs: list[int] = []
    acc = 0
    for fno, _w, v in _parse_fields(buf):
        if fno == 1:
            term = v.decode()
        elif fno == 2:
            df = v
        elif fno == 3:
            cf = v
        elif fno == 4:
            gap, tf_ = 0, 0
            for pf, _pw, pv in _parse_fields(v):
                if pf == 1: gap = pv
                elif pf == 2: tf_ = pv
            acc += gap
            docids.append(acc)
            tfs.append(tf_)
    return term, df, cf, docids, tfs


def encode_doc_record(docid: int, collection_docid: str, doclength: int) -> bytes:
    out = bytearray()
    _put_varint_field(out, 1, docid)
    _put_bytes_field(out, 2, collection_docid.encode())
    _put_varint_field(out, 3, doclength)
    return bytes(out)


def decode_doc_record(buf: bytes) -> tuple[int, str, int]:
    docid, docno, dl = 0, "", 0
    for fno, _w, v in _parse_fields(buf):
        if fno == 1: docid = v
        elif fno == 2: docno = v.decode()
        elif fno == 3: dl = v
    return docid, docno, dl


def _write_delimited(fh, msg: bytes) -> None:
    out = bytearray()
    _write_varint(out, len(msg))
    fh.write(bytes(out))
    fh.write(msg)


def _read_delimited(fh) -> bytes | None:
    # read a varint length byte-by-byte, then the payload
    shift, ln = 0, 0
    while True:
        b = fh.read(1)
        if not b:
            return None
        ln |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return fh.read(ln)


# -------------------------------------------------------------- export/import

def export_ciff(index, out_path: str, description: str = "pyterrier_pisa_spark") -> dict:
    """PersistedIndex -> CIFF file. Terms stream in lexicographic order
    (term_id order); postings in docid order. Driver-streamed: CIFF is a
    single sequential file, so export is inherently single-writer —
    ``toLocalIterator`` keeps memory bounded."""
    from pyspark.sql import functions as F

    lex_it = (
        index.lexicon.select("term_id", "term", "df", "cf")
        .orderBy("term_id").toLocalIterator()
    )
    flat = index.flat_tf().join(index.lexicon.select("term_id", "term"), "term_id")
    grouped = (
        flat.groupBy("term_id")
        .agg(F.sort_array(F.collect_list(F.struct("docid", "tf"))).alias("plist"))
        .orderBy("term_id")
        .toLocalIterator()
    )
    stats = index.stats
    n_terms = stats.get("num_terms") or index.lexicon.count()
    header = CiffHeader(
        version=1,
        num_postings_lists=int(n_terms),
        num_docs=int(stats["num_docs"]),
        total_postings_lists=int(n_terms),
        total_docs=int(stats["num_docs"]),
        total_terms_in_collection=int(stats["total_doclen"]),
        average_doclength=float(stats["avg_doclen"]),
        description=description,
    )
    n_lists = 0
    with open(out_path, "wb") as fh:
        _write_delimited(fh, header.encode())
        for lex_row, grp_row in zip(lex_it, grouped):
            assert lex_row["term_id"] == grp_row["term_id"]
            plist = grp_row["plist"]
            msg = encode_postings_list(
                lex_row["term"], int(lex_row["df"]), int(lex_row["cf"]),
                [p["docid"] for p in plist], [p["tf"] for p in plist],
            )
            _write_delimited(fh, msg)
            n_lists += 1
        for r in index.docmap.orderBy("docid").toLocalIterator():
            _write_delimited(fh, encode_doc_record(int(r["docid"]), r["docno"], int(r["doclen"])))
    return {"postings_lists": n_lists, "num_docs": header.num_docs, "path": out_path}


def import_ciff(spark: SparkSession, ciff_path: str, index_path: str,
                batch_rows: int = 500_000, **build_kwargs) -> dict:
    """CIFF file -> persisted index. Parses driver-side in bounded batches
    into the tf/docmap shard tables, then reuses build phases 2-4 (the same
    protocol streaming compaction uses)."""
    import pandas as pd

    from .index_store import _commit_phase, build_index

    os.makedirs(index_path, exist_ok=True)
    tf_rows: list[tuple] = []
    doc_rows: list[tuple] = []
    doclens: dict[int, int] = {}
    n_lists = 0

    with open(ciff_path, "rb") as fh:
        header = CiffHeader.decode(_read_delimited(fh))
        for _ in range(header.num_postings_lists):
            term, df, cf, docids, tfs = decode_postings_list(_read_delimited(fh))
            n_lists += 1
            for d, t in zip(docids, tfs):
                tf_rows.append((d, term, t))
        for _ in range(header.num_docs):
            docid, docno, dl = decode_doc_record(_read_delimited(fh))
            doc_rows.append((docid, docno, dl))
            doclens[docid] = dl

    def _flush_tf(rows, mode):
        pdf = pd.DataFrame(rows, columns=["docid", "term", "tf"])
        pdf["doclen"] = pdf["docid"].map(doclens).fillna(0).astype("int64")
        spark.createDataFrame(pdf).write.mode(mode).parquet(os.path.join(index_path, "tf"))

    for i in range(0, max(len(tf_rows), 1), batch_rows):
        _flush_tf(tf_rows[i:i + batch_rows] or [], "overwrite" if i == 0 else "append")
    docmap_pdf = pd.DataFrame(doc_rows, columns=["docid", "docno", "doclen"])
    docmap_pdf["content_sha256"] = None
    spark.createDataFrame(docmap_pdf).write.mode("overwrite").parquet(
        os.path.join(index_path, "docmap"))

    _commit_phase(index_path, "tf", {
        "num_docs": int(header.num_docs), "tf_rows": len(tf_rows), "imported_ciff": ciff_path,
    })
    empty = spark.createDataFrame([], schema="docno string, content string")
    meta = build_index(empty, index_path, mode="resume", **build_kwargs)
    return meta

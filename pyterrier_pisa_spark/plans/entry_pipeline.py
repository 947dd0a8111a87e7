"""Driver-contract entries for the training-data pipeline operators
(dedup / similarity / text-analysis / multimodal) with DuckDB oracles.

Hashing note: every hash used here is md5-hex-derived so Spark and DuckDB
compute IDENTICAL values (``conv(substr(md5(x),1,15),16,10)`` ==
``('0x'||substr(md5(x),1,15))::bigint``) — the oracle checks real hash
equality, not just shapes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textstats as TS
from ..operators import dedup as DD
from ..operators import similarity as SIM

NGRAM = 3
JACCARD_T = 0.1
MINHASHES = 8
SIMHASH_BITS = 16
ANN_K = 10
ANN_NQ = 5

# ------------------------------------------------------------- shared SQL

_SQL_DOCTOKS = """
dtoks AS (
    SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS toks
    FROM documents
),
dshingle AS (
    SELECT DISTINCT doc_id,
           toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS shingle
    FROM dtoks, unnest(range(0, greatest(len(toks) - 2, 0))) t(i)
)
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return DD.exact_dup_groups(docs, content_col="text", id_col="doc_id").select(
        "content_md5", F.col("keeper_id").cast("long").alias("keeper_id"),
        F.col("dup_count").cast("long").alias("dup_count")
    )


ORACLE_EXACT_DEDUP = """
SELECT md5(text) AS content_md5, min(doc_id)::BIGINT AS keeper_id,
       count(*)::BIGINT AS dup_count
FROM documents GROUP BY md5(text)
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return DD.jaccard_pairs(docs, content_col="text", id_col="doc_id",
                            n=NGRAM, threshold=JACCARD_T).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"), "jaccard")


ORACLE_NGRAM_JACCARD = f"""WITH {_SQL_DOCTOKS},
sizes AS (SELECT doc_id, count(*) AS n FROM dshingle GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM dshingle a JOIN dshingle b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       round(i / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE i / (sa.n + sb.n - i) >= {JACCARD_T}
"""


def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = DD.minhash_signatures(docs, content_col="text", id_col="doc_id",
                                 n=NGRAM, num_hashes=MINHASHES)
    return sigs.select(F.col("id").cast("long").alias("id"),
                       F.posexplode("sig").alias("j", "minhash")).select(
        "id", F.col("j").cast("int").alias("j"), "minhash")


ORACLE_MINHASH = f"""WITH {_SQL_DOCTOKS}
SELECT s.doc_id::BIGINT AS id, j::INT AS j,
       min(('0x' || substr(md5(j::VARCHAR || ':' || s.shingle), 1, 15))::BIGINT) AS minhash
FROM dshingle s, unnest(range(0, {MINHASHES})) t(j)
GROUP BY s.doc_id, j
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return DD.simhash(docs, content_col="text", id_col="doc_id", bits=SIMHASH_BITS).select(
        F.col("id").cast("long").alias("id"), "simhash")


_simhash_bit_sql = " + ".join(
    f"(CASE WHEN sum(CASE WHEN (h >> {j}) & 1 = 1 THEN tf ELSE -tf END) > 0 "
    f"THEN {1 << j} ELSE 0 END)"
    for j in range(SIMHASH_BITS)
)
ORACLE_SIMHASH = f"""WITH
toks AS (
    SELECT doc_id, tt.term FROM (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        FROM documents) tt WHERE tt.term <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
hashed AS (
    SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf
)
SELECT doc_id::BIGINT AS id, ({_simhash_bit_sql})::BIGINT AS simhash
FROM hashed GROUP BY doc_id
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return TS.lang_id(docs).select(F.col("id").cast("long").alias("id"),
                                   "pred_lang", "top_hits")


def _marker_sql(lang: str) -> str:
    lst = ", ".join(f"'{m}'" for m in TS.LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({lst})))"


ORACLE_LANG_ID = f"""WITH
dtoks AS (
    SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS toks
    FROM documents
),
hits AS (
    SELECT doc_id,
           {_marker_sql('en')} AS hits_en, {_marker_sql('de')} AS hits_de,
           {_marker_sql('es')} AS hits_es, {_marker_sql('fr')} AS hits_fr
    FROM dtoks
)
SELECT doc_id::BIGINT AS id,
       CASE WHEN greatest(hits_en, hits_de, hits_es, hits_fr) <= 0 THEN 'und'
            WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
            WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
            WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
            ELSE 'fr' END AS pred_lang,
       greatest(hits_en, hits_de, hits_es, hits_fr)::BIGINT AS top_hits
FROM hits
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return TS.quality_score(docs).select(
        F.col("id").cast("long").alias("id"), "n_chars", "n_tokens",
        "mean_token_len", "alnum_ratio", "stop_ratio", "quality")


_en_stops = ", ".join(f"'{m}'" for m in TS.LANG_MARKERS["en"])
ORACLE_QUALITY = f"""WITH
base AS (
    SELECT doc_id, length(text) AS n_chars,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks,
           length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alnum
    FROM documents
),
m AS (
    SELECT doc_id, n_chars, len(toks) AS n_tokens, alnum,
           CASE WHEN len(toks) > 0
                THEN list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks)
                ELSE 0.0 END AS mean_tok,
           CASE WHEN n_chars > 0 THEN alnum::DOUBLE / n_chars ELSE 0.0 END AS alnum_ratio,
           CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, t -> t IN ({_en_stops})))::DOUBLE / len(toks)
                ELSE 0.0 END AS stop_ratio
    FROM base
)
SELECT doc_id::BIGINT AS id, n_chars::BIGINT AS n_chars, n_tokens::BIGINT AS n_tokens,
       round(mean_tok, 4) AS mean_token_len, round(alnum_ratio, 4) AS alnum_ratio,
       round(stop_ratio, 4) AS stop_ratio,
       round((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN mean_tok >= 3 AND mean_tok <= 12 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN alnum_ratio >= 0.6 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN stop_ratio >= 0.01 THEN 0.25 ELSE 0.0 END), 2) AS quality
FROM m
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return TS.doc_fingerprint(docs).select(F.col("id").cast("long").alias("id"), "fingerprint")


ORACLE_FINGERPRINT = """WITH
dtoks AS (
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                      t -> t <> '')) AS term
    FROM documents
)
SELECT doc_id::BIGINT AS id,
       md5(string_agg(DISTINCT term, ' ' ORDER BY term)) AS fingerprint
FROM dtoks GROUP BY doc_id
"""


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata plumbing on opaque binary payloads (text bytes
    stand in for media blobs — magic-byte sniff, length, sha256 lineage)."""
    from ..operators.multimodal import attach_media_meta

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("text").cast("binary").alias("payload"), "text"
    )
    out = attach_media_meta(docs, "payload")
    return out.select(F.col("doc_id").cast("long").alias("id"), "media_type",
                      "byte_len", F.sha2(F.col("text"), 256).alias("payload_sha256"))


ORACLE_MEDIA_META = """
SELECT doc_id::BIGINT AS id, 'application/octet-stream' AS media_type,
       octet_length(text::BLOB)::BIGINT AS byte_len,
       sha256(text) AS payload_sha256
FROM documents
"""


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < ANN_NQ).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qvec"))
    return SIM.cosine_topk(emb, queries, k=ANN_K).select(
        "qid", F.col("vec_id").cast("long").alias("vec_id"), "cos",
        F.col("rank").cast("int").alias("rank"))


ORACLE_ANN = f"""WITH
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {ANN_NQ}),
scored AS (
    SELECT q.qid::VARCHAR AS qid, e.vec_id,
           list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS cos
    FROM embeddings e CROSS JOIN q
)
SELECT qid, vec_id::BIGINT AS vec_id, round(cos, 6) AS cos, (rnk - 1)::INT AS rank
FROM (SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored)
WHERE rnk <= {ANN_K}
"""


ANN_BITS = 8
ANN_DIM = 64  # testdata embeddings dim (dataset contract — no first() probe)


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN — fully ORACLED: the hyperplane LSH is seeded and
    deterministic, so the bucket math (sign bits of literal-coefficient dot
    products), the multiprobe equi-join, and the in-bucket exact cosine are
    all reproduced in ANSI SQL with the SAME left-to-right float arithmetic."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < ANN_NQ).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qvec"))
    out = SIM.lsh_cosine_topk(emb, queries, k=ANN_K, bits=ANN_BITS, dim=ANN_DIM,
                              multiprobe_hamming=1)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"), "cos",
                      F.col("rank").cast("int").alias("rank"))


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline — fully ORACLED: md5-derived
    minhashes, band buckets, candidate join, and exact-jaccard verification
    are all deterministic and SQL-expressible."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = DD.minhash_dedup(docs, content_col="text", id_col="doc_id",
                           n=NGRAM, num_hashes=MINHASHES, bands=4, threshold=JACCARD_T)
    return out.select(F.col("id_a").cast("long").alias("id_a"),
                      F.col("id_b").cast("long").alias("id_b"), "jaccard")


NEARDUP_T = 0.28   # testdata embeddings are near-random (max pair cos ~0.47):
NEARDUP_BITS = 6   # the entry pins the PIPELINE (blocking + verify), not recall


def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (the dedup family's embedding member):
    hyperplane-LSH-blocked candidate pairs + exact cosine >= threshold —
    fully ORACLED, the SQL replicating the same seeded bucket math and
    hamming<=1 probe join (pairs outside the blocks are dropped by BOTH
    sides: the entry pins the blocking pipeline, not recall)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = SIM.embedding_near_dup(emb, threshold=NEARDUP_T, bits=NEARDUP_BITS,
                                 dim=ANN_DIM, multiprobe_hamming=1)
    return out.select(F.col("id_a").cast("long").alias("id_a"),
                      F.col("id_b").cast("long").alias("id_b"), "cos")


def _neardup_oracle() -> str:
    """SQL replica of embedding_near_dup(threshold, bits=6, dim=64, seed=42,
    hamming=1): same literal hyperplanes, same single-sided probe explosion
    (each hamming<=1 pair joins exactly once), same left-to-right float
    chains, same round(cos, 6)."""
    planes = SIM._hyperplanes(ANN_DIM, NEARDUP_BITS, seed=42)

    def dot_chain(vec: str, row) -> str:
        return " + ".join(f"{vec}[{i + 1}]::DOUBLE * {float(c)!r}" for i, c in enumerate(row))

    def bucket_expr(vec: str) -> str:
        return " + ".join(
            f"(CASE WHEN 0.0 + {dot_chain(vec, row)} >= 0 THEN {1 << j} ELSE 0 END)"
            for j, row in enumerate(planes)
        )

    pair_dot = " + ".join(f"a.embedding[{i + 1}]::DOUBLE * b.embedding[{i + 1}]::DOUBLE"
                          for i in range(ANN_DIM))
    nrm = lambda pfx: "sqrt(0.0 + " + " + ".join(
        f"{pfx}[{i + 1}]::DOUBLE * {pfx}[{i + 1}]::DOUBLE" for i in range(ANN_DIM)) + ")"
    probes = ", ".join(str(1 << j) for j in range(NEARDUP_BITS))
    return f"""WITH
c AS (SELECT vec_id, embedding, ({bucket_expr('embedding')})::INT AS bucket FROM embeddings),
p AS (SELECT vec_id, embedding, xor(bucket, flip)::INT AS bucket
      FROM c, unnest([0, {probes}]) t(flip)),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           (0.0 + {pair_dot}) / ({nrm('a.embedding')} * {nrm('b.embedding')}) AS cos
    FROM c a JOIN p b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, round(cos, 6) AS cos
FROM pairs WHERE cos >= {NEARDUP_T}
"""


def _lsh_ann_oracle() -> str:
    """SQL replica of lsh_cosine_topk(bits=8, dim=64, seed=42, hamming=1):
    plane coefficients embedded as literals; dot/norm chains written in the
    same left-to-right association as the Spark Column fold so the doubles
    (and therefore the sign bits and the ranking) are bit-identical."""
    planes = SIM._hyperplanes(ANN_DIM, ANN_BITS, seed=42)

    def dot_chain(vec: str, row) -> str:
        return " + ".join(f"{vec}[{i + 1}]::DOUBLE * {float(c)!r}" for i, c in enumerate(row))

    def bucket_expr(vec: str) -> str:
        return " + ".join(
            f"(CASE WHEN 0.0 + {dot_chain(vec, row)} >= 0 THEN {1 << j} ELSE 0 END)"
            for j, row in enumerate(planes)
        )

    pair_dot = " + ".join(f"e.embedding[{i + 1}]::DOUBLE * q.qv[{i + 1}]::DOUBLE"
                          for i in range(ANN_DIM))
    nrm = lambda pfx: "sqrt(0.0 + " + " + ".join(
        f"{pfx}[{i + 1}]::DOUBLE * {pfx}[{i + 1}]::DOUBLE" for i in range(ANN_DIM)) + ")"
    probes = ", ".join(str(1 << j) for j in range(ANN_BITS))
    return f"""WITH
c AS (SELECT vec_id, embedding, ({bucket_expr('embedding')})::INT AS bucket FROM embeddings),
q0 AS (SELECT vec_id AS qid, embedding AS qv,
              ({bucket_expr('embedding')})::INT AS qbucket
       FROM embeddings WHERE vec_id < {ANN_NQ}),
q AS (SELECT qid, qv, xor(qbucket, flip)::INT AS bucket
      FROM q0, unnest([0, {probes}]) t(flip)),
scored AS (
    SELECT q.qid::VARCHAR AS qid, e.vec_id,
           (0.0 + {pair_dot}) / ({nrm('e.embedding')} * {nrm('q.qv')}) AS cos
    FROM c e JOIN q ON e.bucket = q.bucket
)
SELECT qid, vec_id::BIGINT AS vec_id, round(cos, 6) AS cos, (rnk - 1)::INT AS rank
FROM (SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored)
WHERE rnk <= {ANN_K}
"""


_ROWS_PER_BAND = max(1, MINHASHES // 4)
ORACLE_MINHASH_LSH = f"""WITH {_SQL_DOCTOKS},
mh AS (
    SELECT s.doc_id, j,
           min(('0x' || substr(md5(j::VARCHAR || ':' || s.shingle), 1, 15))::BIGINT) AS minhash
    FROM dshingle s, unnest(range(0, {MINHASHES})) t(j)
    GROUP BY s.doc_id, j
),
bands AS (
    SELECT doc_id, (j // {_ROWS_PER_BAND}) AS band,
           string_agg(minhash::VARCHAR, '_' ORDER BY j) AS sig
    FROM mh GROUP BY doc_id, (j // {_ROWS_PER_BAND})
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM dshingle GROUP BY doc_id),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS i
    FROM cand c
    JOIN dshingle a ON a.doc_id = c.id_a
    JOIN dshingle b ON b.doc_id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       round(i / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE i / (sa.n + sb.n - i) >= {JACCARD_T}
"""


IVF_CENTROIDS = 16
IVF_ITERS = 2
IVF_NPROBE = 4
IVF_SEED = 42


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN scale path: seeded deterministic k-means
    coarse quantizer + nprobe search — fully ORACLED: the Lloyd loop has a
    FIXED iteration count and a data-independent seeded init, so the whole
    pipeline (normalize -> iters x (assign, mean, renormalize) -> final
    assign -> nprobe probe -> in-cluster exact dot) unrolls into ANSI SQL
    with the initial centroids embedded as literals (``_ivf_ann_oracle``).
    Recall vs brute force and run-to-run determinism are additionally
    pytest-pinned (tests/test_pipeline_ops.py)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < ANN_NQ).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qvec"))
    cents, assigned = SIM.ivf_build(emb, n_centroids=IVF_CENTROIDS, iters=IVF_ITERS,
                                    seed=IVF_SEED, dim=ANN_DIM)
    out = SIM.ivf_search(assigned, cents, queries, k=ANN_K, nprobe=IVF_NPROBE)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"), "cos",
                      F.col("rank").cast("int").alias("rank"))


def _ivf_ann_oracle() -> str:
    """SQL replica of q_ivf_ann_topk: the seeded INITIAL centroids (the only
    non-SQL input, and data-independent) are embedded as literal arrays; each
    Lloyd round is one assign CTE (stable argmax = row_number over (dot DESC,
    cluster ASC), numpy-argmax tie semantics) + one mean/renormalize CTE
    (empty clusters keep the previous centroid, zero-norm means too, matching
    ``ivf_build``). Float caveat: means/dots differ from numpy BLAS by ulps;
    assignments and the 6-dp-rounded cosine are stable far beyond that."""
    rng = np.random.default_rng(IVF_SEED)
    cents = rng.standard_normal((IVF_CENTROIDS, ANN_DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    init_rows = ",\n    ".join(
        f"({ci}, [{', '.join(repr(float(x)) for x in row)}]::DOUBLE[])"
        for ci, row in enumerate(cents))

    def assign_cte(name: str, cents_cte: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, v, cluster FROM (
    SELECT u.vec_id, u.v, i.cluster,
           row_number() OVER (PARTITION BY u.vec_id
                              ORDER BY list_dot_product(u.v, i.c) DESC,
                                       i.cluster ASC) AS rn
    FROM unitv u CROSS JOIN {cents_cte} i) WHERE rn = 1
)"""

    def update_cte(rnd: int, assign_name: str, prev_cents: str) -> str:
        return f"""m{rnd} AS (
  SELECT cluster, i, avg(v[i+1]) AS m
  FROM {assign_name}, unnest(range(0, {ANN_DIM})) t(i) GROUP BY cluster, i
),
g{rnd} AS (SELECT cluster, array_agg(m ORDER BY i) AS mv FROM m{rnd} GROUP BY cluster),
c{rnd} AS (
  SELECT p.cluster,
         CASE WHEN g.mv IS NULL OR sqrt(list_dot_product(g.mv, g.mv)) <= 0 THEN p.c
              ELSE list_transform(g.mv, x -> x / sqrt(list_dot_product(g.mv, g.mv)))
         END AS c
  FROM {prev_cents} p LEFT JOIN g{rnd} g USING (cluster)
)"""

    ctes = [f"init(cluster, c) AS (VALUES\n    {init_rows})",
            f"""unitv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / greatest(1e-30,
                sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))) AS v
  FROM embeddings
)"""]
    prev = "init"
    for rnd in range(1, max(1, IVF_ITERS) + 1):
        ctes.append(assign_cte(f"a{rnd}", prev))
        ctes.append(update_cte(rnd, f"a{rnd}", prev))
        prev = f"c{rnd}"
    ctes.append(assign_cte("af", prev))
    ctes.append(f"""qn AS (
  SELECT vec_id AS qid,
         list_transform(embedding::DOUBLE[],
           x -> x / (CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[],
                                                     embedding::DOUBLE[])) = 0
                     THEN 1.0
                     ELSE sqrt(list_dot_product(embedding::DOUBLE[],
                                                embedding::DOUBLE[])) END)) AS qv
  FROM embeddings WHERE vec_id < {ANN_NQ}
)""")
    ctes.append(f"""probes AS (
  SELECT qid, qv, cluster FROM (
    SELECT q.qid, q.qv, c.cluster,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY list_dot_product(q.qv, c.c) DESC,
                                       c.cluster ASC) AS rn
    FROM qn q CROSS JOIN {prev} c) WHERE rn <= {IVF_NPROBE}
)""")
    ctes.append("""scored AS (
  SELECT p.qid::VARCHAR AS qid, a.vec_id, list_dot_product(a.v, p.qv) AS cos
  FROM af a JOIN probes p ON a.cluster = p.cluster
)""")
    return f"""WITH
{','.join(ctes)}
SELECT qid, vec_id::BIGINT AS vec_id, round(cos, 6) AS cos, (rnk - 1)::INT AS rank
FROM (SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored)
WHERE rnk <= {ANN_K}
"""


PIPELINE_QUERIES = {
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash": q_minhash,
    "simhash": q_simhash,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "doc_fingerprint": q_doc_fingerprint,
    "media_meta": q_media_meta,
    "ann_cosine_topk": q_ann_cosine_topk,
    "lsh_ann_topk": q_lsh_ann_topk,
    "embedding_neardup_pairs": q_embedding_neardup_pairs,
    "ivf_ann_topk": q_ivf_ann_topk,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
}

PIPELINE_ORACLES = {
    "exact_dedup": ORACLE_EXACT_DEDUP,
    "ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "minhash": ORACLE_MINHASH,
    "simhash": ORACLE_SIMHASH,
    "lang_id": ORACLE_LANG_ID,
    "quality_score": ORACLE_QUALITY,
    "doc_fingerprint": ORACLE_FINGERPRINT,
    "media_meta": ORACLE_MEDIA_META,
    "ann_cosine_topk": ORACLE_ANN,
    "lsh_ann_topk": _lsh_ann_oracle(),
    "embedding_neardup_pairs": _neardup_oracle(),
    "ivf_ann_topk": _ivf_ann_oracle(),
    "minhash_lsh_pairs": ORACLE_MINHASH_LSH,
}

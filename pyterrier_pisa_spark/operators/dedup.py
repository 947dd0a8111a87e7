"""Large-scale training-data deduplication operators (no reference
counterpart — first-class additions for the 100 TB pipeline use-case).

All hashing is md5-hex based (``conv(substr(md5(x),1,15),16,10)``) so every
operator is deterministic, partition-independent, AND reproducible in ANSI
SQL (DuckDB oracle: ``('0x' || substr(md5(x),1,15))::bigint``) — no reliance
on engine-internal hash functions.

Operators (each pure DataFrame ops; shuffles noted):

  exact_dup_groups     hash-groupBy on content        [1 agg shuffle]
  dedup_exact          keep min-id doc per hash       [window over hash]
  shingles             n-gram shingle set per doc     [map-side only]
  jaccard_pairs        pairwise n-gram Jaccard via shingle inverted join —
                       hot shingles capped (a shingle shared by >max_df docs
                       carries ~0 bits for near-dup detection but produces
                       df^2 join rows; dropping it is the standard
                       scalability guard)
  minhash_signatures   k independent md5-permutation min-hashes [1 agg]
  lsh_candidates       band-bucket join -> candidate pairs      [1 agg + join]
  minhash_dedup        LSH candidates verified with EXACT jaccard
  simhash              64-bit sign-of-weighted-bit-sum fingerprint
  simhash_near_pairs   Hamming<=d pairs via 4x16-bit band blocking
  embedding_near_dup   cosine >= threshold pairs (see similarity.py)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_int(col: Column) -> Column:
    """60-bit deterministic hash of a string column (cross-engine stable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _seeded_hash(col: Column, seed: int) -> Column:
    return _md5_int(F.concat(F.lit(f"{seed}:"), col))


# ------------------------------------------------------------- exact dedup

def exact_dup_groups(df: DataFrame, content_col: str = "content",
                     id_col: str = "docid") -> DataFrame:
    """(content_md5, keeper_id, dup_count): one row per distinct content."""
    return df.groupBy(F.md5(F.col(content_col)).alias("content_md5")).agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count")
    )


def dedup_exact(df: DataFrame, content_col: str = "content", id_col: str = "docid") -> DataFrame:
    """Drop exact duplicates, keeping the lowest-id doc per content hash.
    Window over the hash key — skew-safe: group size == duplicate
    multiplicity, not corpus size."""
    w = Window.partitionBy(F.md5(F.col(content_col))).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# -------------------------------------------------------------- shingling

def tokens_col(content: Column) -> Column:
    """Lowercase alnum tokenization as a pure Column expression (JVM-side,
    no UDF) — same semantics as the tokenizer UDF with stemmer='none'."""
    return F.filter(F.split(F.lower(content), "[^a-z0-9]+"), lambda t: t != "")


def shingles(df: DataFrame, content_col: str = "content", id_col: str = "docid",
             n: int = 3) -> DataFrame:
    """(id, shingle): distinct word n-grams per doc. JVM-side only:
    transform over a token array — no Python, no shuffle.

    The token array is MATERIALIZED by a projection boundary first: inlining
    ``tokens_col`` into the shingle lambda makes Catalyst re-evaluate the
    regex split per ``element_at`` reference — O(tokens * n) splits of the
    full document text per row (measured 10.9 s -> 0.46 s for the same
    5.5k-doc shingle noop at sf0.1, a 23x win; guide §1.2 per-task work)."""
    base = df.select(F.col(id_col).alias("id"),
                     tokens_col(F.col(content_col)).alias("_toks"))
    toks = F.col("_toks")
    sh = F.array_distinct(
        F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda _, i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        )
    )
    return base.select("id", F.explode(sh).alias("shingle"))


DEFAULT_MAX_SHINGLE_DF = 1000


def jaccard_pairs(df: DataFrame, content_col: str = "content", id_col: str = "docid",
                  n: int = 3, threshold: float = 0.5,
                  max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF) -> DataFrame:
    """(id_a, id_b, jaccard) for id_a < id_b with n-gram Jaccard >= threshold.

    inverted-join plan: shingle -> (doc pairs sharing it) -> count = |A∩B|;
    |A∪B| = |A|+|B|-|A∩B|. ``max_shingle_df`` drops ultra-hot shingles —
    a shingle shared by >max_df docs carries ~0 bits for near-dup detection
    but produces df^2 join rows, so the quadratic guard is ON by default
    (pass ``None`` to disable for small/exact runs). NOTE: dropping a hot
    shingle removes it from the intersection AND the per-doc set sizes, so
    jaccard stays a consistent similarity over the filtered shingle space."""
    sh = shingles(df, content_col, id_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("sdf")).filter(
            F.col("sdf") > max_shingle_df).select("shingle")
        sh = sh.join(hot, "shingle", "left_anti")
    # sizes over the FILTERED shingle space (consistency: |A|,|B| and |A∩B|
    # must count the same universe or jaccard can exceed 1 / lose symmetry)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "nb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# ---------------------------------------------------------------- minhash

def minhash_signatures(df: DataFrame, content_col: str = "content", id_col: str = "docid",
                       n: int = 3, num_hashes: int = 16) -> DataFrame:
    """(id, sig: array<long>) — sig[j] = min over shingles of h_j(shingle).
    One agg shuffle; the j hash functions are computed as JVM columns."""
    sh = shingles(df, content_col, id_col, n)
    mins = sh.groupBy("id").agg(
        *[F.min(_seeded_hash(F.col("shingle"), j)).alias(f"h{j}") for j in range(num_hashes)]
    )
    return mins.select("id", F.array(*[f"h{j}" for j in range(num_hashes)]).alias("sig"))


def lsh_candidates(sigs: DataFrame, bands: int = 4, num_hashes: int = 16) -> DataFrame:
    """Band the signature; docs sharing any band bucket become candidate
    pairs (id_a < id_b). Bucket key is the band's hash tuple as a string."""
    rows_per_band = max(1, num_hashes // bands)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.concat_ws("_", F.lit(bi),
                            *[F.col("sig")[bi * rows_per_band + j] for j in range(rows_per_band)])
                for bi in range(bands)
            ])
        ).alias("bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def exact_jaccard_for_pairs(df: DataFrame, pairs: DataFrame,
                            content_col: str = "content", id_col: str = "docid",
                            n: int = 3, include_zero_pairs: bool = True) -> DataFrame:
    """Exact n-gram Jaccard for a GIVEN pair set only (id_a, id_b) ->
    (id_a, id_b, jaccard). Cost scales with |pairs| * avg_shingles, NOT with
    the corpus's co-occurrence structure: the shingle sets are attached to
    the pair frame by two equi-joins on doc id — no shingle self-join, so no
    df^2 blow-up on hot shingles.

    ``include_zero_pairs=False`` skips the join-back that re-emits pairs with
    no shared shingle (jaccard 0) — callers that threshold-filter anyway
    (minhash_dedup) avoid a second traversal of the pairs subtree."""
    sh = shingles(df, content_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a_sh = sh.select(F.col("id").alias("id_a"), "shingle")
    b_sh = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        pairs.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "shingle"])  # matches only shared shingles
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    if include_zero_pairs:
        # left join back: pairs with zero shared shingles get jaccard 0
        inter = pairs.join(inter, ["id_a", "id_b"], "left").fillna({"inter": 0})
    out = (
        inter
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "nb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_dedup(df: DataFrame, content_col: str = "content", id_col: str = "docid",
                  n: int = 3, num_hashes: int = 16, bands: int = 4,
                  threshold: float = 0.5) -> DataFrame:
    """LSH candidates -> verified with exact Jaccard computed on the
    CANDIDATE PAIRS ONLY (``exact_jaccard_for_pairs``): candidate generation
    is ~linear in the corpus, verification is linear in the candidate count —
    the full near-dup plan never forms the all-co-occurring-pairs join."""
    sigs = minhash_signatures(df, content_col, id_col, n, num_hashes)
    cand = lsh_candidates(sigs, bands, num_hashes)
    exact = exact_jaccard_for_pairs(df, cand, content_col, id_col, n,
                                    include_zero_pairs=False)
    return exact.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# ----------------------------------------------------------------- simhash

def simhash(df: DataFrame, content_col: str = "content", id_col: str = "docid",
            bits: int = 16) -> DataFrame:
    """(id, simhash): sign-aggregated term-hash fingerprint, tf-weighted.
    bit j of simhash = 1 iff sum over terms of tf * (bit j of h(term) ? +1 : -1) > 0.
    JVM-side: explode tokens -> term counts -> bit extraction via shifts."""
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens_col(F.col(content_col))).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    h = tf.withColumn("h", _md5_int(F.col("term")))
    agg = h.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    out = agg.select(
        "id",
        sum(
            (F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(bits)),
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return out


def simhash_near_pairs(df: DataFrame, content_col: str = "content", id_col: str = "docid",
                       bits: int = 16, max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """(id_a, id_b, hamming <= max_hamming): block on band equality (a pair
    within Hamming d differs in <= d bands, so with bands > d at least one
    band matches — standard pigeonhole blocking), verify exact Hamming."""
    sh = simhash(df, content_col, id_col, bits)
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    banded = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.concat_ws("_", F.lit(bi),
                        F.shiftright(F.col("simhash"), bi * band_bits).bitwiseAND(F.lit(mask)))
            for bi in range(bands)
        ])).alias("bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    ham = pairs.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
    return ham.filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")

"""Training-data pipeline operators: dedup / similarity / textstats /
multimodal. Exact ops are oracle-checked by the driver; these tests pin the
approximate paths (LSH recall vs exact) and the multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyterrier_pisa_spark.functions.textstats import doc_fingerprint, lang_id, quality_score
from pyterrier_pisa_spark.operators import dedup as DD
from pyterrier_pisa_spark.operators import similarity as SIM
from pyterrier_pisa_spark.operators.multimodal import (
    attach_media_meta,
    audio_features,
    decode_image_features,
    resize_images,
    sample_frames,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "completely different content about spark engines and shuffles"),
    (4, "der schnelle braune fuchs und die katze und das haus ist"),
    (5, "el gato que corre por la casa de los perros"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = DD.exact_dup_groups(docs, "text", "doc_id").collect()
    by_keeper = {r["keeper_id"]: r["dup_count"] for r in groups}
    assert by_keeper[0] == 2  # docs 0 and 2
    kept = DD.dedup_exact(docs, "text", "doc_id").select("doc_id").collect()
    assert {r["doc_id"] for r in kept} == {0, 1, 3, 4, 5}


def test_jaccard_pairs(spark, docs):
    pairs = DD.jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).collect()
    d = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert d[(0, 2)] == 1.0
    assert (0, 1) in d  # near-dup: 6/8 shared 3-shingles
    assert d[(0, 1)] == pytest.approx(6 / 8)
    assert all(a < b for a, b in d)
    assert not any({3, 4, 5} & {a, b} for a, b in d)


def test_minhash_lsh_recall(spark, docs):
    """LSH candidates must contain every high-jaccard pair (recall@threshold)
    — the contract that makes the approximate path usable for dedup."""
    exact = DD.jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    truth = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    found = DD.minhash_dedup(docs, "text", "doc_id", n=3, num_hashes=16, bands=8,
                             threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in found.collect()}
    assert truth <= got | truth  # no crash path
    missed = truth - got
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    # and verified jaccard values agree with the exact operator
    ex = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
    for r in found.collect():
        assert r["jaccard"] == pytest.approx(ex[(r["id_a"], r["id_b"])])


def test_simhash_near_pairs(spark, docs):
    sh = {r["id"]: r["simhash"] for r in DD.simhash(docs, "text", "doc_id").collect()}
    assert sh[0] == sh[2]  # identical docs, identical fingerprint
    pairs = DD.simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((0, 2)) == 0
    assert (0, 1) in got  # near-dup within small hamming distance


def test_lsh_ann_matches_bruteforce_topk(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((80, 16)).astype(np.float32)
    # plant near-duplicates of vec 0..4
    for i in range(5):
        base[40 + i] = base[i] + rng.standard_normal(16).astype(np.float32) * 0.01
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(80)],
        schema="vec_id long, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qvec"))
    brute = SIM.cosine_topk(emb, q, k=3).collect()
    approx = SIM.lsh_cosine_topk(emb, q, k=3, bits=8, multiprobe_hamming=1).collect()
    btop = {(r["qid"], r["rank"]): r["vec_id"] for r in brute}
    # rank-0 must be the vector itself; the planted near-dup must be found
    for i in range(5):
        assert btop[(str(i), 0)] == i
        assert btop[(str(i), 1)] == 40 + i
    atop = {(r["qid"], r["rank"]): r["vec_id"] for r in approx}
    for i in range(5):
        assert atop[(str(i), 0)] == i, "LSH must recover the exact match"
        assert atop[(str(i), 1)] == 40 + i, "LSH must recover the planted near-dup"


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal((30, 8)).astype(np.float32)
    base[20] = base[3] * 2.0  # same direction -> cos == 1
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)],
        schema="vec_id long, embedding array<float>",
    )
    pairs = SIM.embedding_near_dup(emb, threshold=0.99, bits=6).collect()
    assert any(r["id_a"] == 3 and r["id_b"] == 20 for r in pairs)


def test_lang_id_and_quality(spark, docs):
    langs = {r["id"]: r["pred_lang"] for r in lang_id(docs, "text", "doc_id").collect()}
    assert langs[0] == "en"
    assert langs[4] == "de"
    assert langs[5] == "es"
    q = {r["id"]: r for r in quality_score(docs, "text", "doc_id").collect()}
    assert q[0]["n_tokens"] == 9
    assert q[0]["stop_ratio"] == pytest.approx(round(2 / 9, 4))
    assert 0.0 <= q[0]["quality"] <= 1.0


def test_doc_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        schema="doc_id long, text string",
    )
    fp = {r["id"]: r["fingerprint"] for r in doc_fingerprint(df, "text", "doc_id").collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\nrestofpng"),
        (1, b"\xff\xd8\xff\xe0jpegdata"),
        (2, b"RIFF....WAVEdata"),
        (3, b"plain text payload"),
    ]
    return spark.createDataFrame(rows, schema="id long, payload binary")


def test_media_meta_magic_sniff(spark, media):
    out = {r["id"]: r for r in attach_media_meta(media).collect()}
    assert out[0]["media_type"] == "image/png"
    assert out[1]["media_type"] == "image/jpeg"
    assert out[2]["media_type"] == "audio/wav"
    assert out[3]["media_type"] == "application/octet-stream"
    assert out[3]["byte_len"] == len(b"plain text payload")


def test_image_features_deterministic(spark, media):
    f1 = decode_image_features(media, dim=16).collect()
    f2 = decode_image_features(media, dim=16).collect()
    d1 = {r["id"]: r["features"] for r in f1}
    d2 = {r["id"]: r["features"] for r in f2}
    assert d1.keys() == d2.keys()
    for k in d1:
        assert d1[k] == d2[k], "fake decoder must be deterministic"
        assert len(d1[k]) == 16


def test_real_decoder_raises_on_unsupported_format(spark, media):
    # jpeg has no stdlib codec — the real path must raise loudly, not fake it
    with pytest.raises(Exception, match="NotImplementedError|PNG payloads only"):
        decode_image_features(media.filter("id = 1"), decoder="real").collect()


def test_real_decoder_rejects_corrupt_png(spark, media):
    # valid PNG signature, garbage chunks -> loud corrupt-PNG error
    with pytest.raises(Exception, match="corrupt PNG"):
        decode_image_features(media.filter("id = 0"), decoder="real").collect()


def test_resize_and_frames_shapes(spark, media):
    rs = resize_images(media, height=8, width=8).collect()
    assert all(len(r["resized"]) == 8 * 8 * 3 for r in rs)
    fr = sample_frames(media, n_frames=3).collect()
    assert len(fr) == 4 * 3
    per = {}
    for r in fr:
        per.setdefault(r["id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2] for v in per.values())
    au = audio_features(media, n_coeffs=8).collect()
    assert all(len(r["coeffs"]) == 8 and r["duration_s"] > 0 for r in au)


def test_exact_jaccard_for_pairs_only_touches_pairs(spark, docs):
    """Verification operator: output rows == input pair set exactly; values
    agree with the full jaccard_pairs operator."""
    pairs = spark.createDataFrame([(0, 1), (0, 2), (3, 4)], schema="id_a long, id_b long")
    out = DD.exact_jaccard_for_pairs(docs, pairs, "text", "doc_id", n=3).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert set(got) == {(0, 1), (0, 2), (3, 4)}
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in DD.jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.0,
                                      max_shingle_df=None).collect()}
    assert got[(0, 1)] == pytest.approx(full[(0, 1)])
    assert got[(0, 2)] == pytest.approx(full[(0, 2)])
    assert got[(3, 4)] == 0.0  # disjoint pair: jaccard 0, still emitted


def test_minhash_dedup_plan_has_no_shingle_self_join(spark, docs):
    """Plan-shape pin (round-1 verdict): verification must NOT contain the
    quadratic shingle self-join (join condition on shingle equality with an
    id '<' range predicate). The only '<' join in the plan is the LSH
    candidate generation on band buckets."""
    found = DD.minhash_dedup(docs, "text", "doc_id", n=3, bands=8, threshold=0.5)
    plan = found._jdf.queryExecution().optimizedPlan().toString()
    import re

    joins_with_lt = [ln for ln in plan.splitlines() if "Join" in ln and "<" in ln]
    assert len(joins_with_lt) == 1, joins_with_lt  # LSH cand-gen only
    assert "bucket" in joins_with_lt[0]
    assert not re.search(r"Join .*shingle#\d+ = shingle#\d+.*<", plan)


def test_jaccard_pairs_hot_shingle_guard_consistent(spark):
    """max_shingle_df filters hot shingles from BOTH the intersection and the
    set sizes (jaccard stays <= 1 and symmetric over the filtered space)."""
    rows = [(i, "common words everywhere here unique%d token%d extra%d" % (i, i, i))
            for i in range(8)]
    rows += [(100, "common words everywhere here unique1 token1 extra1")]  # near-dup of 1
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = DD.jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.0, max_shingle_df=5)
    pdf = out.toPandas()
    assert (pdf["jaccard"] <= 1.0).all()
    d = {(r.id_a, r.id_b): r.jaccard for r in pdf.itertuples()}
    assert d.get((1, 100)) == 1.0  # identical over the filtered shingle space


def test_ivf_ann_recall_and_determinism(spark):
    """IVF coarse-quantizer ANN: planted near-duplicates must be recovered
    (recall vs brute force) and the seeded pipeline must be run-to-run
    deterministic."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 16)).astype(np.float64)
    for i in range(5):
        base[60 + i] = base[i] + rng.standard_normal(16) * 0.01
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(120)],
        schema="vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qvec"))

    cents, assigned = SIM.ivf_build(emb, n_centroids=8, iters=2, seed=42, dim=16)
    assert cents.shape == (8, 16)
    got = SIM.ivf_search(assigned, cents, q, k=5, nprobe=3).toPandas()
    exact = SIM.cosine_topk(emb, q, k=5).toPandas()
    # recall@5 vs brute force
    hits = 0
    for qid in exact["qid"].unique():
        t = set(exact[exact["qid"] == qid]["vec_id"])
        g = set(got[got["qid"] == qid]["vec_id"])
        hits += len(t & g)
    recall = hits / len(exact)
    assert recall >= 0.6, recall
    # the planted near-dup must be found for each query
    for i in range(5):
        g = set(got[got["qid"] == str(i)]["vec_id"])
        assert 60 + i in g or i in g
    # determinism: identical output across rebuilds
    cents2, assigned2 = SIM.ivf_build(emb, n_centroids=8, iters=2, seed=42, dim=16)
    got2 = SIM.ivf_search(assigned2, cents2, q, k=5, nprobe=3).toPandas()
    a = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = got2.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_lsh_high_dim_vectorized_bucket_path(spark):
    """Production embedding dims must NOT build a bits*dim literal Catalyst
    expression (10^4-10^5-node tree -> codegen fallback, minutes of
    planning): above the cell threshold `with_bucket` switches to an Arrow
    matmul (MapInPandas in the plan), below it stays a pure expression.
    Recall contract is unchanged: self + planted near-dup recovered at
    dim=768 / bits=20."""
    rng = np.random.default_rng(11)
    dim, bits, n = 768, 20, 200
    base = rng.standard_normal((n, dim))
    for i in range(3):
        base[100 + i] = base[i] + rng.standard_normal(dim) * 0.01
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        schema="vec_id long, embedding array<double>",
    )
    # plan shape: high-dim -> MapInPandas, small-dim -> literal expression
    planes_hi = SIM._hyperplanes(dim, bits, seed=42)
    hi_plan = SIM.with_bucket(
        emb.select(F.col("embedding").alias("v")), "v", planes_hi
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in hi_plan
    planes_lo = SIM._hyperplanes(8, 4, seed=42)
    lo_plan = SIM.with_bucket(
        emb.select(F.slice(F.col("embedding"), 1, 8).alias("v")), "v", planes_lo
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in lo_plan

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qvec"))
    approx = SIM.lsh_cosine_topk(emb, q, k=3, bits=bits, dim=dim,
                                 multiprobe_hamming=1).collect()
    atop = {(r["qid"], r["rank"]): r["vec_id"] for r in approx}
    for i in range(3):
        assert atop[(str(i), 0)] == i
        assert atop[(str(i), 1)] == 100 + i


def test_ivf_many_centroids_high_dim(spark):
    """100 TB IVF shape: the centroid update must collect one ARRAY row per
    cluster (not n_centroids x dim scalar rows). n_centroids=1024 at dim=768
    completes in bounded time and yields unit centroids + a full assignment."""
    rng = np.random.default_rng(13)
    n, dim, k = 400, 768, 1024
    base = rng.standard_normal((n, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        schema="vec_id long, embedding array<double>",
    )
    cents, assigned = SIM.ivf_build(emb, n_centroids=k, iters=2, seed=42, dim=dim)
    assert cents.shape == (k, dim)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, rtol=1e-9)
    pdf = assigned.toPandas()
    assert len(pdf) == n
    assert pdf["cluster"].between(0, k - 1).all()
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").cast("string").alias("qid"), F.col("embedding").alias("qvec"))
    got = SIM.ivf_search(assigned, cents, q, k=3, nprobe=8).toPandas()
    # rank-0 self-hit: a query vector probes its own cluster by construction
    top0 = got[got["rank"] == 0].set_index("qid")["vec_id"]
    assert top0["0"] == 0 and top0["1"] == 1

def test_real_wav_decode(spark):
    """decoder='real' genuinely decodes RIFF/WAVE with the stdlib wave
    module: header-true duration, windowed rFFT features with the spectral
    peak at the synthesized tone's bin."""
    import io
    import wave as wave_mod

    import numpy as np

    rate, secs, freq = 8000, 1.0, 440.0
    t = np.arange(int(rate * secs)) / rate
    pcm = (np.sin(2 * np.pi * freq * t) * 32000).astype("<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    payload = buf.getvalue()
    df = spark.createDataFrame([(7, payload)], schema="id long, payload binary")

    rows = audio_features(df, n_coeffs=64, decoder="real").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["duration_s"] == 1.0
    assert r["n_windows"] == rate // 512
    co = np.array(r["coeffs"])
    expected_bin = round(freq * 512 / rate)  # 440 Hz -> bin ~28 at window 512
    assert abs(int(np.argmax(co)) - expected_bin) <= 1
    # determinism
    again = audio_features(df, n_coeffs=64, decoder="real").collect()[0]
    assert list(again["coeffs"]) == list(r["coeffs"])
    # non-WAV payloads still refuse loudly in real mode
    mp3 = spark.createDataFrame([(1, b"ID3fakecompressed")], "id long, payload binary")
    with pytest.raises(Exception, match="WAV|RIFF"):
        audio_features(mp3, decoder="real").collect()

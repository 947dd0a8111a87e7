"""Reproducible LocalSearcher latency measurement at the reference's serving
regime (~200k docs, hot multi-term queries, k=1000) — the like-for-like
comparison against BASELINE.md's reference figures (0.88-1.8 ms/query,
single-node C++ over mmap).

Measures three engines over the SAME index:
  dense float64   (bm25 runtime scoring, exact)
  dense int32     (quantized impact index — the r4 integer fast path)
  blockmax        (compressed-blocks engine, cross-check)

Usage: python tools/serve_latency.py [ndocs] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
OUT = sys.argv[2] if len(sys.argv) > 2 else None
K = 1000
N_QUERIES = 60
REPS = 5


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyterrier_pisa_spark.operators.serve import LocalSearcher
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import (build_index, load_index,
                                                          quantize_index)

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("serve_latency")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="serve_lat_")
    path = os.path.join(tmp, "idx")
    t0 = time.time()
    corpus = synth_code_corpus(spark, num_docs=N_DOCS, seed=13)
    build_index(corpus, path, stemmer="porter2", mode="overwrite")
    idx = load_index(spark, path)
    build_sec = time.time() - t0
    qpath = os.path.join(tmp, "qidx")
    quantize_index(idx, qpath, scorer="bm25", bits=8)
    qidx = load_index(spark, qpath)

    # hot 3-term queries over the df-head (the reference's hot-query regime)
    vocab = [r["term"] for r in
             idx.lexicon.orderBy(F.desc("df"), F.asc("term")).limit(12).collect()]
    queries = [(f"q{i}", f"{vocab[i % 12]} {vocab[(i + 3) % 12]} {vocab[(i + 7) % 12]}")
               for i in range(N_QUERIES)]

    def lat_profile(searcher) -> dict:
        searcher.search(queries[:3], k=K)  # warm
        lat = []
        for _ in range(REPS):
            for q in queries:
                t = time.perf_counter()
                searcher.search([q], k=K)
                lat.append(time.perf_counter() - t)
        lat_ms = sorted(1000 * x for x in lat)
        return {"p50_ms": round(lat_ms[len(lat_ms) // 2], 3),
                "p95_ms": round(lat_ms[int(len(lat_ms) * 0.95)], 3),
                "min_ms": round(lat_ms[0], 3), "max_ms": round(lat_ms[-1], 3),
                "n": len(lat)}

    res = {"ndocs": N_DOCS, "k": K, "n_queries": N_QUERIES, "reps": REPS,
           "build_sec": round(build_sec, 1),
           "postings": int(idx.blocks.agg(F.sum("count")).collect()[0][0])}

    t0 = time.time()
    ls_f = LocalSearcher(idx, scorer="bm25")
    res["dense_f64_build_sec"] = round(time.time() - t0, 2)
    res["dense_f64"] = lat_profile(ls_f)

    t0 = time.time()
    ls_q = LocalSearcher(qidx, scorer="quantized")
    res["dense_int32_build_sec"] = round(time.time() - t0, 2)
    assert ls_q._acc_i is not None, "int path should be armed"
    assert ls_q._dvecs, "df-head dense cache should be armed"
    res["dense_int32"] = lat_profile(ls_q)
    res["dense_cache_terms"] = len(ls_q._dvecs)

    # honesty profiles: (a) the same hot queries with the df-head dense cache
    # DISABLED (pure scatter — what tail-heavy traffic would see), (b) mid-df
    # tail-term queries on the cached searcher (mixed/scatter route)
    ls_q0 = LocalSearcher(qidx, scorer="quantized", dense_cache_bytes=0)
    res["dense_int32_cache_off"] = lat_profile(ls_q0)
    tail_vocab = [r["term"] for r in
                  idx.lexicon.orderBy(F.desc("df"), F.asc("term"))
                  .limit(400).collect()][200:212]
    tail_queries = [(f"t{i}", f"{tail_vocab[i % 12]} {tail_vocab[(i + 3) % 12]} "
                             f"{tail_vocab[(i + 7) % 12]}")
                    for i in range(N_QUERIES)]
    sub = list(queries)
    queries[:] = tail_queries
    res["dense_int32_tail_terms"] = lat_profile(ls_q)
    queries[:] = sub

    ls_b = LocalSearcher(idx, scorer="bm25", mode="blockmax")
    res["blockmax"] = lat_profile(ls_b)

    # rank identity spot-check between engines on this workload
    a = ls_f.search(queries[:5], k=50)
    b = ls_b.search(queries[:5], k=50)
    assert list(a["docid"]) == list(b["docid"]), "engines disagree"
    res["engines_rank_identical_spot"] = True

    print(json.dumps(res, indent=1))
    if OUT:
        with open(OUT, "w") as fh:
            json.dump(res, fh, indent=1)
    # append to the repo-root run history (same pattern as SCALING.json) so
    # the multi-run serving-latency evidence is one committed artifact, not
    # numbers transcribed into prose
    res["ts"] = round(time.time(), 1)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist_path = os.path.join(root, "SERVE_LATENCY.json")
    hist = {"runs": []}
    if os.path.exists(hist_path):
        try:
            hist = json.load(open(hist_path))
        except Exception:
            pass
    hist["runs"].append(res)
    sel = [r for r in hist["runs"] if r.get("ndocs") == N_DOCS and "dense_int32" in r]
    if sel:
        hist["p50_int32_runs_ms"] = [r["dense_int32"]["p50_ms"] for r in sel]
        hist["p50_int32_median_ms"] = round(
            statistics.median(hist["p50_int32_runs_ms"]), 3)
    with open(hist_path, "w") as fh:
        json.dump(hist, fh, indent=1)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

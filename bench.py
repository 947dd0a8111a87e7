"""Per-round benchmark: headline build + query workloads at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ..., "extra": {...}}

Workloads:
  build_documents_index   persisted block-index build over documents.parquet
  bm25_blockmax_batch     40-query batch, k=1000, pruned per-query kernel
  bm25_batchmode_batch    same batch, docid-partitioned batch kernel
  bm25_exhaustive_batch   same batch through the exhaustive DataFrame plan
  synth_build_20k         synthetic source-code corpus (20k docs, zipfian)
                          end-to-end build -> docs/sec in extra
  synth_query_batch       40 queries over the 20k synth index (porter2)
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 1000
N_SYNTH = int(os.environ.get("BENCH_SYNTH_DOCS", "20000"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_queries(terms: list[str], n: int) -> list[tuple[str, str]]:
    out = []
    pairs = itertools.cycle(itertools.combinations(terms, 2))
    for i in range(n):
        a, b = next(pairs)
        out.append((f"b{i}", f"{a} {b}"))
    return out


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyterrier_pisa_spark.operators.wand import retrieve_blockmax, retrieve_blockmax_batch
    from pyterrier_pisa_spark.plans.pipeline import build_logical_index, retrieve
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import build_index, load_index

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict = {"cpus": CPUS}
    tmp = tempfile.mkdtemp(prefix="bench_idx_")

    # warm-up (untimed): JIT the JVM codepaths + spawn Arrow python workers so
    # headline numbers measure steady-state, not first-call compilation
    warm = synth_code_corpus(spark, num_docs=1000, seed=1)
    build_index(warm, f"{tmp}/warm", stemmer="porter2", mode="overwrite")
    widx = load_index(spark, f"{tmp}/warm")
    retrieve_blockmax(widx, [("w", "parse index")], k=100, include_query=False).count()
    retrieve_blockmax_batch(widx, [("w", "parse index")], k=100, include_query=False).count()

    # ---- 1. build over driver testdata documents
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("doc_id").cast("string").alias("docno"),
        F.col("text").alias("content"),
    )
    n_docs = docs.count()
    t0 = time.time()
    build_index(docs, f"{tmp}/docs_idx", stemmer="none", id_col="doc_id", mode="overwrite")
    timings["build_documents_index"] = time.time() - t0
    extra["documents_docs_per_sec"] = round(n_docs / timings["build_documents_index"], 1)

    idx = load_index(spark, f"{tmp}/docs_idx")
    vocab = [r["term"] for r in idx.lexicon.orderBy(F.desc("df"), F.asc("term")).limit(24).collect()]
    queries = make_queries(vocab, 40)

    # ---- 2. pruned kernel batch
    t0 = time.time()
    n_res = retrieve_blockmax(idx, queries, k=K, include_query=False).count()
    timings["bm25_blockmax_batch"] = time.time() - t0
    extra["blockmax_ms_per_query"] = round(1000 * timings["bm25_blockmax_batch"] / len(queries), 2)
    extra["blockmax_rows"] = n_res

    # ---- 2b. docid-partitioned batch mode (index moves once per batch)
    t0 = time.time()
    n_res_b = retrieve_blockmax_batch(idx, queries, k=K, include_query=False).count()
    timings["bm25_batchmode_batch"] = time.time() - t0
    extra["batchmode_ms_per_query"] = round(1000 * timings["bm25_batchmode_batch"] / len(queries), 2)
    extra["batchmode_rows"] = n_res_b

    # ---- 3. exhaustive DataFrame plan batch
    logical = idx.as_logical()
    logical.tf = logical.tf.persist()
    logical.tf.count()
    t0 = time.time()
    n_res2 = retrieve(logical, queries, k=K, include_query=False).count()
    timings["bm25_exhaustive_batch"] = time.time() - t0
    extra["exhaustive_rows"] = n_res2

    # ---- 3b. precompute_impact: quantize once, then integer dot-product batch
    from pyterrier_pisa_spark.sources.index_store import quantize_index

    t0 = time.time()
    quantize_index(idx, f"{tmp}/docs_qidx", scorer="bm25", bits=8)
    timings["quantize_index"] = time.time() - t0
    qidx = load_index(spark, f"{tmp}/docs_qidx")
    t0 = time.time()
    n_res_q = retrieve_blockmax_batch(qidx, queries, k=K, scorer="quantized",
                                      include_query=False).count()
    timings["bm25_impact_batch"] = time.time() - t0
    extra["impact_ms_per_query"] = round(1000 * timings["bm25_impact_batch"] / len(queries), 2)
    extra["impact_rows"] = n_res_q

    # ---- 4. synthetic source-code corpus build (porter2, bigger)
    synth = synth_code_corpus(spark, num_docs=N_SYNTH, seed=11)
    t0 = time.time()
    build_index(synth, f"{tmp}/synth_idx", stemmer="porter2", mode="overwrite")
    timings["synth_build_20k"] = time.time() - t0
    extra["synth_docs_per_sec"] = round(N_SYNTH / timings["synth_build_20k"], 1)

    # ---- 5. query the synth index
    sidx = load_index(spark, f"{tmp}/synth_idx")
    svocab = [r["term"] for r in sidx.lexicon.orderBy(F.desc("df"), F.asc("term")).limit(24).collect()]
    squeries = make_queries(svocab, 40)
    t0 = time.time()
    retrieve_blockmax(sidx, squeries, k=K, include_query=False).count()
    timings["synth_query_batch"] = time.time() - t0
    extra["synth_ms_per_query"] = round(1000 * timings["synth_query_batch"] / len(squeries), 2)

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()

    # embed the latest scaling-efficiency evidence (north rule) if present
    scaling_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    if os.path.exists(scaling_file):
        with open(scaling_file) as fh:
            sc = json.load(fh)
        extra["scaling"] = {
            "best": next(iter(sc["best"]["pairs"].values()), {}) if "best" in sc else sc.get("pairs"),
            "last": next(iter(sc["last"]["pairs"].values()), {}) if "last" in sc else None,
            "best_each": sc.get("best_each"),
            "n_runs": len(sc.get("runs", [])) or 1,
            "method": "tools/scaling_bench.py — fixed-work, core-pinned, 2->8 cores;"
                      " best-of over recorded runs (host noise 2-3x); full history in"
                      " SCALING.json, table in BASELINE.md"}

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "fulltext_index_e2e_sec",
        "value": total,
        "unit": "sec",
        "queries": {k_: round(v, 3) for k_, v in timings.items()},
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "extra": extra,
    }))


if __name__ == "__main__":
    main()

"""Per-round benchmark: headline build + query workloads at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ..., "extra": {...}}

Every workload runs $BENCH_REPEATS times (default 3): the headline
``queries`` value is the MEDIAN, and ``extra.repeats`` carries min/median/
all-runs/spread per workload — this host shows 2-3x run-to-run variance, so
single-shot numbers cannot distinguish a regression from a contended-host
outlier (round-2 lesson: a one-shot artifact recorded a phantom 10x
regression that a re-run dissolved).

Workloads:
  build_documents_index   persisted block-index build over documents.parquet
  bm25_blockmax_batch     40-query batch, k=1000, pruned per-query kernel
  bm25_batchmode_batch    same batch, docid-partitioned batch kernel
  bm25_exhaustive_batch   same batch through the exhaustive DataFrame plan
  quantize_index          precompute_impact fold (8-bit)
  bm25_impact_batch       integer dot-product batch over the quantized index
  synth_build_20k         synthetic source-code corpus (20k docs, zipfian)
  synth_query_batch       40 queries over the 20k synth index (porter2)
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 1000
N_SYNTH = int(os.environ.get("BENCH_SYNTH_DOCS", "20000"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_queries(terms: list[str], n: int) -> list[tuple[str, str]]:
    out = []
    pairs = itertools.cycle(itertools.combinations(terms, 2))
    for i in range(n):
        a, b = next(pairs)
        out.append((f"b{i}", f"{a} {b}"))
    return out


class Bench:
    """Repeat each workload, keep median as the headline + full stats."""

    def __init__(self, repeats: int):
        self.repeats = repeats
        self.timings: dict[str, float] = {}       # medians (headline)
        self.stats: dict[str, dict] = {}

    def run(self, name: str, fn) -> None:
        runs = []
        for _ in range(self.repeats):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        med = statistics.median(runs)
        self.timings[name] = med
        self.stats[name] = {
            "min": round(min(runs), 3),
            "median": round(med, 3),
            "runs": [round(r, 3) for r in runs],
            "spread": round(max(runs) / max(1e-9, min(runs)), 2),
        }


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyterrier_pisa_spark.operators.wand import retrieve_blockmax, retrieve_blockmax_batch
    from pyterrier_pisa_spark.plans.pipeline import retrieve
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import (build_index, load_index,
                                                          quantize_index)

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

    bench = Bench(REPEATS)
    extra: dict = {"cpus": CPUS, "repeats": REPEATS}
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
    bench.run("build_documents_index",
              lambda: build_index(docs, f"{tmp}/docs_idx", stemmer="none",
                                  id_col="doc_id", mode="overwrite"))
    extra["documents_docs_per_sec"] = round(
        n_docs / bench.timings["build_documents_index"], 1)

    idx = load_index(spark, f"{tmp}/docs_idx")
    vocab = [r["term"] for r in idx.lexicon.orderBy(F.desc("df"), F.asc("term")).limit(24).collect()]
    queries = make_queries(vocab, 40)

    # ---- 2. pruned kernel batch
    counts: dict[str, int] = {}
    bench.run("bm25_blockmax_batch", lambda: counts.__setitem__(
        "bm", retrieve_blockmax(idx, queries, k=K, include_query=False).count()))
    extra["blockmax_ms_per_query"] = round(
        1000 * bench.timings["bm25_blockmax_batch"] / len(queries), 2)
    extra["blockmax_rows"] = counts["bm"]

    # ---- 2b. docid-partitioned batch mode (index moves once per batch)
    bench.run("bm25_batchmode_batch", lambda: counts.__setitem__(
        "bb", retrieve_blockmax_batch(idx, queries, k=K, include_query=False).count()))
    extra["batchmode_ms_per_query"] = round(
        1000 * bench.timings["bm25_batchmode_batch"] / len(queries), 2)
    extra["batchmode_rows"] = counts["bb"]

    # ---- 3. exhaustive DataFrame plan batch
    logical = idx.as_logical()
    logical.tf = logical.tf.persist()
    logical.tf.count()
    bench.run("bm25_exhaustive_batch", lambda: counts.__setitem__(
        "ex", retrieve(logical, queries, k=K, include_query=False).count()))
    extra["exhaustive_rows"] = counts["ex"]

    # ---- 3b. precompute_impact: quantize once, then integer dot-product batch
    bench.run("quantize_index",
              lambda: quantize_index(idx, f"{tmp}/docs_qidx", scorer="bm25", bits=8))
    qidx = load_index(spark, f"{tmp}/docs_qidx")
    bench.run("bm25_impact_batch", lambda: counts.__setitem__(
        "iq", retrieve_blockmax_batch(qidx, queries, k=K, scorer="quantized",
                                      include_query=False).count()))
    extra["impact_ms_per_query"] = round(
        1000 * bench.timings["bm25_impact_batch"] / len(queries), 2)
    extra["impact_rows"] = counts["iq"]

    # ---- 4. synthetic source-code corpus build (porter2, bigger)
    synth = synth_code_corpus(spark, num_docs=N_SYNTH, seed=11)
    bench.run("synth_build_20k",
              lambda: build_index(synth, f"{tmp}/synth_idx", stemmer="porter2",
                                  mode="overwrite"))
    extra["synth_docs_per_sec"] = round(N_SYNTH / bench.timings["synth_build_20k"], 1)

    # ---- 5. query the synth index
    sidx = load_index(spark, f"{tmp}/synth_idx")
    svocab = [r["term"] for r in sidx.lexicon.orderBy(F.desc("df"), F.asc("term")).limit(24).collect()]
    squeries = make_queries(svocab, 40)
    bench.run("synth_query_batch",
              lambda: retrieve_blockmax(sidx, squeries, k=K, include_query=False).count())
    extra["synth_ms_per_query"] = round(
        1000 * bench.timings["synth_query_batch"] / len(squeries), 2)

    # ---- 6. in-process serving latency (LocalSearcher): the apples-to-apples
    # number against the reference's single-node ms/query — same kernel as the
    # Spark path, zero task-scheduling floor. Construction (one collect) is
    # timed separately from per-query latency.
    from pyterrier_pisa_spark.operators.serve import LocalSearcher

    t0 = time.time()
    ls = LocalSearcher(sidx)
    extra["local_serve_build_sec"] = round(time.time() - t0, 3)
    ls.search(squeries[:2], k=K)  # warm (numba-free, but page-in + caches)
    lat = []
    for rep in range(REPEATS):
        for q in squeries:
            t0 = time.time()
            ls.search([q], k=K)
            lat.append(time.time() - t0)
    # local-serve latency lives ONLY under extra: the headline
    # fulltext_index_e2e_sec total keeps the same workload set as r1/r2 so
    # BENCH history stays comparable round-over-round.
    lat_ms = sorted(1000 * x for x in lat)
    extra["local_serve_ms_per_query_p50"] = round(lat_ms[len(lat_ms) // 2], 3)
    extra["local_serve_ms_per_query_p95"] = round(lat_ms[int(len(lat_ms) * 0.95)], 3)
    extra["local_serve_batch_sec_per_rep"] = round(sum(lat) / REPEATS, 4)

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()

    extra["repeats_detail"] = bench.stats
    extra["max_spread"] = max(s["spread"] for s in bench.stats.values())

    # ---- co-measured HOST ENVELOPE (after spark.stop(), so the JVM isn't
    # competing): K single-core copies of a fixed tokenize+stem workload. The
    # ABSOLUTE single-copy seconds identify a degraded host window from the
    # artifact alone (this box is bimodal for hours at a time — round 4's
    # committed artifact recorded a phantom 2x query regression that a
    # same-code re-run in a clean window dissolved); the 1->8 ratio is the
    # concurrency ceiling the same-run bench numbers sat under.
    try:
        extra["host_envelope"] = _host_envelope()
    except Exception as e:  # envelope is evidence, never a bench failure
        extra["host_envelope"] = {"error": str(e)[:200]}

    # embed the latest scaling-efficiency evidence (north rule) if present
    scaling_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    if os.path.exists(scaling_file):
        with open(scaling_file) as fh:
            sc = json.load(fh)
        last = next(iter(sc["last"]["pairs"].values()), None) if "last" in sc else None
        if last is not None and sc["last"].get("contaminated"):
            # the most recent history entry is an invalid measurement — carry
            # the marker so the artifact can't be read as a regression
            last = dict(last, contaminated=True)
        extra["scaling"] = {
            "best": next(iter(sc["best"]["pairs"].values()), {}) if "best" in sc else sc.get("pairs"),
            "last": last,
            "best_each": sc.get("best_each"),
            # per-workload medians over the FULL interleaved history (one
            # efficiency sample per run; different corpus sizes measure
            # different fixed-cost regimes and never pool) — both the raw
            # 2->8-core ratio and the same ratio normalized by each run's
            # co-measured host envelope. This replaces the old
            # "median_recent" (last-3-runs-of-whatever-workload-ran-last),
            # which could lead the artifact with a single contended window.
            "interleaved_per_workload": _interleaved_medians(sc.get("runs", [])),
            "n_runs": len(sc.get("runs", [])) or 1,
            "method": "tools/scaling_bench.py — fixed-work, core-pinned, 2->8 cores;"
                      " history in SCALING.json, table in BASELINE.md"}

    total = round(sum(bench.timings.values()), 3)
    result = {
        "metric": "fulltext_index_e2e_sec",
        "value": total,
        "unit": "sec",
        "queries": {k_: round(v, 3) for k_, v in bench.timings.items()},
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "extra": extra,
    }
    # FULL result (repeats detail, scaling history pointers) goes to a file —
    # a file write cannot be tail-truncated the way the driver's terminal
    # capture is (rounds 3 AND 4 recorded "parsed": null because the one
    # stdout JSON line was longer than the ~2000-char tail window, so its
    # HEAD was cut off).
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    # stdout gets ONE line — a compact variant hard-capped under the capture
    # window, so the line is simultaneously the first and last line of output
    # and survives the tail capture whole.
    print(json.dumps(_compact(result), separators=(",", ":")))


# measured clean-window single-copy seconds for the envelope workload (40k
# synthetic 400-token docs, tokenize+porter2, one pinned core; calibrated
# 2026-08-17, three runs 3.0-3.2s). degradation = measured / ref; > ~1.3
# marks a contended-host window whose bench numbers overstate cost.
_ENVELOPE_REF_T1_SEC = 3.0
_ENVELOPE_DOCS = 40000


def _host_envelope() -> dict:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(here, "tools"))
    from host_envelope import WORK, run_k

    fd, script = tempfile.mkstemp(suffix=".py")
    with os.fdopen(fd, "w") as fh:
        fh.write(WORK.format(repo=here, docs=_ENVELOPE_DOCS))
    try:
        run_k(1, script)  # warm page cache / pyc
        t1 = run_k(1, script)
        t8 = run_k(8, script)
    finally:
        os.unlink(script)
    t1m, t8m = statistics.mean(t1), statistics.mean(t8)
    return {
        "workload": f"python_tokenize_stem_{_ENVELOPE_DOCS}x400tok",
        "t1_sec": round(t1m, 3),
        "t8_mean_sec": round(t8m, 3),
        "concurrency_ratio_1_to_8": round(t1m / t8m, 3),
        "ref_t1_sec": _ENVELOPE_REF_T1_SEC,
        "degradation_vs_ref": round(t1m / _ENVELOPE_REF_T1_SEC, 2),
        "note": "degradation_vs_ref > ~1.3 => contended-host window; compare"
                " bench numbers across rounds only at like degradation",
    }


def _interleaved_medians(runs: list) -> dict:
    """Per-workload medians over every interleaved-protocol run of the
    current engine fingerprint (eng=r5c; other fingerprints — e.g. the
    reverted r5b experiment — are separate methodologies and never pool).
    Keyed by doc count ('100k', ...); raw = ratio of per-level median
    throughputs, envnorm = raw / that run's co-measured host envelope."""
    by_docs: dict = {}
    for r in runs:
        if r.get("protocol") != "interleaved":
            continue
        if "eng=r5c" not in r.get("config_fp", ""):
            continue
        if r.get("contaminated"):
            # invalid measurement (e.g. another bench/scaling job ran on the
            # box concurrently) — recorded for the audit trail, never pooled
            continue
        p = next(iter(r.get("pairs", {}).values()), None)
        if not p:
            continue
        by_docs.setdefault(r.get("docs", 0), []).append(p)
    out = {}
    for docs in sorted(by_docs):
        ps = by_docs[docs]
        def med(key):
            vals = [p[key] for p in ps if p.get(key) is not None]
            return round(statistics.median(vals), 3) if vals else None
        out[f"{docs // 1000}k"] = {
            "n_runs": len(ps),
            "build_eff_median_raw": med("build_scaling_efficiency"),
            "query_eff_median_raw": med("query_scaling_efficiency"),
            "build_eff_median_envnorm": med("build_eff_envelope_normalized"),
            "query_eff_median_envnorm": med("query_eff_envelope_normalized"),
        }
    return out


def _compact(result: dict) -> dict:
    """The stdout variant: same metric/value/queries, slimmed extra. Hard cap
    1800 bytes (the driver keeps the LAST ~2000 chars of output and parses
    the final line — the whole line must fit inside that window)."""
    x = result["extra"]
    slim = {k: x[k] for k in (
        "cpus", "repeats", "documents_docs_per_sec", "blockmax_ms_per_query",
        "batchmode_ms_per_query", "impact_ms_per_query", "synth_docs_per_sec",
        "synth_ms_per_query", "local_serve_ms_per_query_p50",
        "local_serve_ms_per_query_p95", "max_spread") if k in x}
    env = x.get("host_envelope") or {}
    slim["host_envelope"] = {k: env[k] for k in (
        "t1_sec", "t8_mean_sec", "degradation_vs_ref") if k in env}
    sc = x.get("scaling") or {}
    if sc:
        # per-workload medians only — the full per-run lists live in
        # bench_out.json and SCALING.json; embedding them here would outgrow
        # the 1800-byte cap
        slim["scaling"] = {k: sc[k] for k in (
            "interleaved_per_workload", "n_runs") if sc.get(k) is not None}
    slim["detail"] = "bench_out.json"
    out = dict(result, extra=slim)
    # progressive strip if ever over budget (defensive; normally ~1 KB)
    for victim in ("scaling", "host_envelope", "detail"):
        if len(json.dumps(out, separators=(",", ":"))) <= 1800:
            break
        out["extra"].pop(victim, None)
    return out


if __name__ == "__main__":
    main()


import json, os, sys, tempfile, time
cpus = int(sys.argv[1]); ndocs = int(sys.argv[2]); nq = int(sys.argv[3])
avg_tokens = int(sys.argv[4]) if len(sys.argv) > 4 else 400
mode = sys.argv[5] if len(sys.argv) > 5 else "local"
repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo_root)
# scratch + index outputs on tmpfs: this sandbox has ONE shared disk, so at
# the high core count the (constant-bandwidth) shuffle/parquet I/O becomes
# the bottleneck and its 25%+ run-to-run contention noise swamps the
# efficiency signal. A real cluster has per-node scratch NVMe that scales
# with nodes — tmpfs is the local-mode stand-in that measures ENGINE
# scaling, not single-disk bandwidth.
scratch = tempfile.mkdtemp(prefix=f"scale_shm_{cpus}_",
                           dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
from pyspark.sql import SparkSession, functions as F
# mode 'cluster': PROCESS-ISOLATED workers (Spark standalone local-cluster —
# one JVM + its own python workers PER executor, communicating over
# loopback), the closest single-host stand-in for adding real cluster
# nodes: per-executor overheads (GC threads, shuffle servers) scale WITH
# the worker count like a real 4N-node cluster, unlike local[N]'s one
# shared JVM.
if mode == "cluster":
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    master = f"local-cluster[{cpus},1,3072]"
else:
    master = f"local[{cpus}]"
spark = (SparkSession.builder.master(master)
    .appName(f"scaling_{cpus}")
    .config("spark.executorEnv.PYTHONPATH", repo_root)
    .config("spark.local.dir", scratch)
    .config("spark.sql.shuffle.partitions", "64")  # FIXED across levels: the
    # job's task structure must be identical at N and 4N cores, otherwise the
    # comparison measures different work, not scaling
    # AQE OFF for the evidence runs: every shuffle width here is explicit and
    # fixed (the task-structure contract above), so adaptive re-planning buys
    # nothing and its per-stage driver pauses are pure serial constants that
    # depress the measured efficiency at BOTH levels' expense (worse at 4N)
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
    .config("spark.sql.files.maxPartitionBytes", "16m")
    # v2 commit: per-task renames instead of a serial driver-side commit
    # pass — the commit cost is constant across core counts and eats
    # directly into scaling efficiency
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
from pyterrier_pisa_spark.sources.index_store import build_index, load_index
from pyterrier_pisa_spark.operators.wand import retrieve_blockmax, retrieve_blockmax_batch
tmp = tempfile.mkdtemp(prefix=f"scale_{cpus}_", dir=scratch)
# ---- warm-up (JIT + python workers), untimed
warm = synth_code_corpus(spark, num_docs=2000, seed=1)
build_index(warm, f"{tmp}/warm", stemmer="porter2", mode="overwrite")
widx = load_index(spark, f"{tmp}/warm")
retrieve_blockmax(widx, [("w", "parse index")], k=100, include_query=False).count()
# ---- materialize the input corpus OUTSIDE the timed region: corpus
# synthesis is harness work, not engine work — a real deployment reads
# existing data. chunk_span sized so the corpus spans ~150 chunks.
corpus = synth_code_corpus(spark, num_docs=ndocs, seed=11, avg_tokens=avg_tokens)
corpus.write.mode("overwrite").parquet(f"{tmp}/corpus")
corpus = spark.read.parquet(f"{tmp}/corpus")
t0 = time.time()
build_index(corpus, f"{tmp}/idx", stemmer="porter2", mode="overwrite", chunk_span=2048,
            num_partitions=64)
build_sec = time.time() - t0
# ---- timed query batch (warm the index reads first)
idx = load_index(spark, f"{tmp}/idx")
# query vocab must ROUND-TRIP the query pipeline (lexicon terms are stems;
# re-stemming can alter them, e.g. els->el) and not be stopwords — filtering
# makes every query return exactly k rows, so result_rows == nq*k is a
# cross-run/cross-level invariant instead of depending on vocab order
from pyterrier_pisa_spark.functions.porter2 import CachedStemmer
from pyterrier_pisa_spark.functions.stopwords import DEFAULT_STOPWORDS, get_stopwords
_st = CachedStemmer()
_stops = frozenset(_st(w) for w in get_stopwords(DEFAULT_STOPWORDS))
vocab = [r["term"] for r in idx.lexicon.orderBy(F.desc("df"), F.asc("term")).limit(60).collect()]
vocab = [t for t in vocab if _st(t) == t and t not in _stops][:30]
queries = [(f"q{i}", f"{vocab[i % 30]} {vocab[(i + 7) % 30]} {vocab[(i + 13) % 30]}")
           for i in range(nq)]
retrieve_blockmax_batch(idx, queries[:8], k=100, include_query=False).count()
t0 = time.time()
nres = retrieve_blockmax_batch(idx, queries, k=100, include_query=False).count()
query_sec = time.time() - t0
phases = {}
for name in ("tf", "lexicon", "postings", "maxscore"):
    try:
        phases[name] = round(json.load(open(f"{tmp}/idx/_phases/{name}.done"))["sec"], 2)
    except Exception:
        pass
phases["other"] = round(build_sec - sum(phases.values()), 2)
print(json.dumps({"cpus": cpus, "build_sec": round(build_sec, 2),
                  "build_docs_per_sec": round(ndocs / build_sec, 1),
                  "build_phases": phases,
                  "query_sec": round(query_sec, 2),
                  "queries_per_sec": round(nq / query_sec, 1),
                  "ms_per_query": round(1000 * query_sec / nq, 2),
                  "result_rows": nres}))
spark.stop()
import shutil
shutil.rmtree(scratch, ignore_errors=True)

"""spark-submit entry point (north_star: "the whole job ships as
spark-submit --py-files with zero per-row Python on the hot path").

    spark-submit --py-files dist/pyterrier_pisa_spark.zip tools/submit_job.py \
        build  <corpus.parquet> <index_path> [stemmer]
    spark-submit --py-files dist/pyterrier_pisa_spark.zip tools/submit_job.py \
        query  <index_path> <query text> [k]
    spark-submit --py-files dist/pyterrier_pisa_spark.zip tools/submit_job.py \
        smoke  [num_docs]          # self-contained: synth corpus -> build -> query

Imports of the engine happen INSIDE main() — after spark-submit has placed
the --py-files zip on the path — so this file works with no local install.
Prints one JSON line.
"""

import json
import sys
import tempfile


def main() -> None:
    from pyspark.sql import SparkSession

    cmd = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    spark = SparkSession.builder.appName(f"pisa_spark_{cmd}").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from pyterrier_pisa_spark import build_index, load_index, retrieve_blockmax

    if cmd == "build":
        corpus_path, index_path = sys.argv[2], sys.argv[3]
        stemmer = sys.argv[4] if len(sys.argv) > 4 else "porter2"
        meta = build_index(spark.read.parquet(corpus_path), index_path,
                           stemmer=stemmer, mode="overwrite")
        print(json.dumps({"cmd": "build", "index": index_path,
                          "num_docs": meta["stats"]["num_docs"],
                          "num_terms": meta["stats"]["num_terms"],
                          "built_sec": round(meta["built_sec"], 2)}))
    elif cmd == "query":
        index_path, qtext = sys.argv[2], sys.argv[3]
        k = int(sys.argv[4]) if len(sys.argv) > 4 else 10
        idx = load_index(spark, index_path)
        res = retrieve_blockmax(idx, [("q1", qtext)], k=k).collect()
        print(json.dumps({"cmd": "query", "k": k, "rows": len(res),
                          "top": [(r["docno"], round(r["score"], 4)) for r in res[:3]]}))
    elif cmd == "smoke":
        from pyterrier_pisa_spark.sources.corpus import synth_code_corpus

        n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
        tmp = tempfile.mkdtemp(prefix="submit_smoke_")
        build_index(synth_code_corpus(spark, num_docs=n, seed=3), f"{tmp}/idx",
                    mode="overwrite")
        idx = load_index(spark, f"{tmp}/idx")
        rows = retrieve_blockmax(idx, [("q1", "parse index"), ("q2", "merge shard")],
                                 k=10).count()
        print(json.dumps({"cmd": "smoke", "num_docs": n, "result_rows": rows,
                          "ok": rows > 0}))
    else:
        raise SystemExit(f"unknown command {cmd!r}")
    spark.stop()


if __name__ == "__main__":
    main()

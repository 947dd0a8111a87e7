"""Generate the frozen golden run (FIXTURES.md §5): BM25 top-k over the
deterministic synthetic corpus, written once to tests/golden/ and committed.
Every engine variant (exhaustive plan, pruned kernel, batch kernel, any
parallelism) must reproduce it exactly in docids/ranks and to float32
precision in scores — the cross-round regression gate.

Usage: python tools/make_golden.py   (only rerun if the corpus generator or
scoring contract deliberately changes; commit the diff consciously)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")
N_DOCS = 500
SEED = 13
K = 20
QUERIES = [
    ("g1", "parse index query"),
    ("g2", "def return"),
    ("g3", "merge shard stream"),
    ("g4", "var3 var17 get_codec"),
    ("g5", "nonexistentterm parse"),
]


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession

    from pyterrier_pisa_spark.operators.wand import retrieve_blockmax
    from pyterrier_pisa_spark.sources.corpus import synth_code_corpus
    from pyterrier_pisa_spark.sources.index_store import build_index, load_index

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp()
    corpus = synth_code_corpus(spark, num_docs=N_DOCS, seed=SEED)
    build_index(corpus, f"{tmp}/idx", stemmer="porter2", mode="overwrite")
    idx = load_index(spark, f"{tmp}/idx")
    res = retrieve_blockmax(idx, QUERIES, k=K, include_query=False).toPandas()
    res = res.sort_values(["qid", "rank"]).reset_index(drop=True)
    out = {
        "n_docs": N_DOCS, "seed": SEED, "k": K, "queries": QUERIES,
        "scorer": {"name": "bm25", "k1": 0.9, "b": 0.4}, "stemmer": "porter2",
        "rows": [
            {"qid": r.qid, "docid": int(r.docid), "docno": r.docno,
             "score": round(float(r.score), 4), "rank": int(r.rank)}
            for r in res.itertuples()
        ],
    }
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, "bm25_topk_synth.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path} with {len(out['rows'])} rows")


if __name__ == "__main__":
    main()

"""Host scaling-envelope calibration: how much per-core throughput this box
loses as more cores go active — the HARDWARE ceiling any engine's measured
N->4N efficiency sits under on a single machine (shared LLC / memory
bandwidth / turbo bins; a real cluster adds NODES, so this degradation does
not apply there).

Runs K identical single-core, single-process workloads concurrently
(K = 2 then K = 8 by default), pinned to distinct cores, and reports the
per-process slowdown. Two workload shapes:

  python  — tokenizer + porter2 stemming loop (the build's tf phase shape)
  jvm     — (optional, needs --jvm) one Spark-free numpy shuffle-ish pass

Envelope efficiency = mean_time(K=low) / mean_time(K=high); an engine
measuring raw efficiency E on this host has engine-attributable efficiency
~E / envelope.

Usage: python tools/host_envelope.py [--low 2 --high 8 --docs 2000]
Appends one JSON line to SCALING.json under "envelope".
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

WORK = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyterrier_pisa_spark.functions.tokenizer import tokenize_text
import numpy as np
rng = np.random.default_rng(7)
vocab = [f"var{{i}}" for i in range(400)] + ["parse","build","index","query","score","merge"]
docs = [" ".join(vocab[j] for j in rng.integers(0, len(vocab), 400)) for _ in range({docs})]
t0 = time.time()
for d in docs:
    tokenize_text(d, stemmer="porter2")
print(time.time() - t0)
"""


def run_k(k: int, script: str, base_core: int = 8) -> list[float]:
    procs = []
    for i in range(k):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(base_core + i), sys.executable, script],
            stdout=subprocess.PIPE, text=True,
            env=dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1")))
    return [float(p.communicate()[0].strip().splitlines()[-1]) for p in procs]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--docs", type=int, default=2000)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fd, script = tempfile.mkstemp(suffix=".py")
    with os.fdopen(fd, "w") as fh:
        fh.write(WORK.format(repo=repo, docs=args.docs))

    run_k(1, script)  # warm page cache / pyc
    lo = run_k(args.low, script)
    hi = run_k(args.high, script)
    os.unlink(script)
    env_eff = statistics.mean(lo) / statistics.mean(hi)
    out = {
        "metric": "host_envelope",
        "workload": "python_tokenize_stem",
        "low_k": args.low, "high_k": args.high,
        "low_sec": [round(x, 3) for x in lo],
        "high_sec": [round(x, 3) for x in hi],
        "envelope_efficiency": round(env_eff, 3),
        "note": "per-core throughput ratio with high_k vs low_k cores active;"
                " hardware ceiling for single-box N->4N scaling measurements",
    }
    print(json.dumps(out))
    sc_path = os.path.join(repo, "SCALING.json")
    if os.path.exists(sc_path):
        with open(sc_path) as fh:
            sc = json.load(fh)
        sc.setdefault("envelope", []).append(out)
        with open(sc_path, "w") as fh:
            json.dump(sc, fh, indent=1)


if __name__ == "__main__":
    main()

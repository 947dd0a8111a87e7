"""Variance decomposition of the interleaved scaling history.

Answers ONE question quantitatively: when a run's raw N->4N efficiency
reads low, which level's measurement moved — the 2-core baseline or the
8-core level? If the engine's parallel plan were the limiter, 8-core
times would be stably slow (pinned at max(serial_fraction, work/8));
if the box's shared-bandwidth windows are the limiter, the 8-core level
(which needs 4x the DRAM traffic per second) inherits the window luck
and the ratio follows it.

    python tools/scaling_variance.py        # markdown-ish analysis to stdout

Reads SCALING.json; per-workload (never pooled across corpus sizes):
  - Pearson corr of per-run raw efficiency vs each level's median time
  - per-level rep-granularity coefficient of variation (same code+input)
  - box-best and fastest-3 pairings (both levels at their observed best)
"""

from __future__ import annotations

import json
import os
import statistics as st


def pearson(a: list[float], b: list[float]) -> float:
    ma, mb = st.mean(a), st.mean(b)
    num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
    den = (sum((x - ma) ** 2 for x in a) * sum((y - mb) ** 2 for y in b)) ** 0.5
    return num / den if den else float("nan")


def analyze(runs: list[dict], phase: str) -> dict:
    key_sec = f"{phase}_sec"
    key_reps = f"runs_{phase}_sec"
    key_eff = f"{phase}_scaling_efficiency"
    eff = [next(iter(r["pairs"].values()))[key_eff] for r in runs]
    t2 = [r["levels"]["2"][key_sec] for r in runs]
    t8 = [r["levels"]["8"][key_sec] for r in runs]
    r2 = [x for r in runs for x in r["levels"]["2"][key_reps]]
    r8 = [x for r in runs for x in r["levels"]["8"][key_reps]]
    out = {
        "n_runs": len(runs),
        "corr_eff_vs_2core_sec": round(pearson(t2, eff), 3) if len(runs) > 2 else None,
        "corr_eff_vs_8core_sec": round(pearson(t8, eff), 3) if len(runs) > 2 else None,
        "cv_2core_reps": round(st.stdev(r2) / st.mean(r2), 3) if len(r2) > 1 else None,
        "cv_8core_reps": round(st.stdev(r8) / st.mean(r8), 3) if len(r8) > 1 else None,
        "range_8core_reps": (min(r8), max(r8)),
        "range_2core_reps": (min(r2), max(r2)),
        "best_pair_eff": round(min(r2) / min(r8) / 4.0, 3),
        "fastest3_pair_eff": round(
            st.mean(sorted(r2)[:3]) / st.mean(sorted(r8)[:3]) / 4.0, 3
        ),
    }
    return out


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist = json.load(open(os.path.join(root, "SCALING.json")))
    inter = [r for r in hist.get("runs", []) if r.get("protocol") == "interleaved"]
    for docs in sorted({r["docs"] for r in inter}):
        sub = [r for r in inter if r["docs"] == docs]
        print(f"## {docs // 1000}k docs ({len(sub)} interleaved runs)")
        for phase in ("build", "query"):
            a = analyze(sub, phase)
            lo8, hi8 = a["range_8core_reps"]
            lo2, hi2 = a["range_2core_reps"]
            print(f"- {phase}: corr(eff, 2-core sec) = {a['corr_eff_vs_2core_sec']}, "
                  f"corr(eff, 8-core sec) = {a['corr_eff_vs_8core_sec']}; "
                  f"rep CV 2-core {a['cv_2core_reps']} (range {lo2}-{hi2} s) vs "
                  f"8-core {a['cv_8core_reps']} (range {lo8}-{hi8} s, "
                  f"{hi8 / lo8:.2f}x same code+input); "
                  f"box-best pairing {a['best_pair_eff']}, "
                  f"fastest-3 pairing {a['fastest3_pair_eff']}")
        print()


if __name__ == "__main__":
    main()

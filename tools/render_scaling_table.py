"""Render the round-5 interleaved-protocol evidence table from SCALING.json.

The BASELINE.md scaling table is generated, not hand-typed, so the committed
narrative provably matches the committed artifact:

    python tools/render_scaling_table.py            # markdown to stdout

Covers EVERY interleaved-protocol run (all engine fingerprints, labelled),
with the in-window bandwidth-probe classification where a run carries one.
"""

from __future__ import annotations

import json
import os
import statistics as st


def classify(run: dict, best_bw: float | None) -> str:
    tr = [p["bw_gbps"] for p in run.get("probe_trace", []) if "bw_gbps" in p]
    if not tr:
        return "unprobed"
    med = st.median(tr)
    if best_bw and min(tr) >= 0.8 * med and med >= 0.8 * best_bw:
        return "clean"
    return "contended"


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist = json.load(open(os.path.join(root, "SCALING.json")))
    inter = [r for r in hist.get("runs", []) if r.get("protocol") == "interleaved"]
    if not inter:
        print("(no interleaved runs)")
        return
    # best_bw derives the clean/contended classification for EVERY run, so a
    # contaminated run's probe median must not shift it (ADVICE r5)
    probes = [r.get("probe_bw_median_gbps") for r in inter
              if not r.get("contaminated")]
    best_bw = max((p for p in probes if p), default=None)

    def eng(r):
        fp = r.get("config_fp", "")
        for part in fp.split("|"):
            if part.startswith("eng="):
                return part[4:]
        return "r5a"

    print("| run | engine | docs | build eff | query eff | bw probe (GB/s, med/min) | window |")
    print("|---|---|---|---|---|---|---|")
    rows = []
    for i, r in enumerate(inter, 1):
        p = next(iter(r["pairs"].values()))
        tr = [q["bw_gbps"] for q in r.get("probe_trace", []) if "bw_gbps" in q]
        bw = f"{st.median(tr):.1f} / {min(tr):.1f}" if tr else "—"
        docs = r.get("docs", 0)
        if r.get("contaminated"):
            # invalid measurement (concurrent job on the box) — shown in the
            # table for the audit trail, excluded from every median and from
            # the window classification entirely
            w = "CONTAMINATED (excluded)"
        else:
            w = classify(r, best_bw)
            rows.append((p["build_scaling_efficiency"], p["query_scaling_efficiency"], w, docs))
        b, q = p["build_scaling_efficiency"], p["query_scaling_efficiency"]
        bs = f"**{b}**" if b >= 0.8 else f"{b}"
        qs = f"**{q}**" if q >= 0.8 else f"{q}"
        print(f"| {i} | {eng(r)} | {docs // 1000}k | {bs} | {qs} | {bw} | {w} |")
    print()
    # medians are per-workload: efficiency ratios at different corpus sizes
    # measure different fixed-cost regimes and must never pool
    for docs in sorted({x[3] for x in rows}):
        sub = [x for x in rows if x[3] == docs]
        print(f"{docs // 1000}k-doc runs ({len(sub)}): build median "
              f"{st.median(x[0] for x in sub):.3f}, query median "
              f"{st.median(x[1] for x in sub):.3f}.", end="")
        clean = [x for x in sub if x[2] == "clean"]
        if clean:
            print(f" Clean-window ({len(clean)}): build "
                  f"{st.median(x[0] for x in clean):.3f}, query "
                  f"{st.median(x[1] for x in clean):.3f}.", end="")
        cont = [x for x in sub if x[2] == "contended"]
        if cont:
            print(f" Contended ({len(cont)}): build "
                  f"{st.median(x[0] for x in cont):.3f}, query "
                  f"{st.median(x[1] for x in cont):.3f}.", end="")
        print()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-query bench regression gate (round-15 item: make the
round-over-round comparison mechanical now that full artifacts are
committed).

Usage: python3 tools/bench_diff.py BENCH_full_rPREV.json \
           BENCH_full_rCUR.json [BENCH_DIFF_out.md]

Joins the two artifacts' per-query kept readings (each already the
min-of-runs, load-gated by the bench itself), flags regressions worse
than REGRESSION_X net of ambient load — a query is only flagged when
its cur/prev ratio exceeds the threshold AFTER discounting by the
ambient-load ratio at its run (a reading taken on a 6-loadavg box is
not a regression verdict against a 1-loadavg baseline) — and writes a
markdown report: flagged regressions (the gate), notable improvements,
and adds/drops. Exit code 1 when any regression is flagged, so the
round ritual can gate on it.

Dev-tool only — the shipped library has no Python dependency.
"""
import json
import sys

REGRESSION_X = 1.5   # flag when cur > prev * X (ambient-adjusted)
MIN_SECONDS = 0.25   # ignore sub-250ms rows: pure jitter territory


def load(path):
    d = json.load(open(path))
    return d


def ambient_of(d, q):
    # per-query ambient loadavg stamp; fall back to the run-wide start
    # (which is a "1m 5m 15m" string — take the 1-minute figure)
    a = d.get("ambient", {}).get(q)
    if a is None:
        a = str(d.get("load_start", "1.0")).split()[0]
    return max(float(a), 0.5)


def main():
    prev_p, cur_p = sys.argv[1], sys.argv[2]
    out_p = sys.argv[3] if len(sys.argv) > 3 else None
    prev, cur = load(prev_p), load(cur_p)
    pq, cq = prev["queries"], cur["queries"]
    shared = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    dropped = sorted(set(pq) - set(cq))

    regressions, improvements = [], []
    for q in shared:
        p, c = float(pq[q]), float(cq[q])
        if max(p, c) < MIN_SECONDS:
            continue
        raw = c / p if p > 0 else float("inf")
        # ambient discount: scale the prev reading up by the ambient
        # ratio when cur ran under heavier load (never discount below
        # the raw ratio when cur ran on a QUIETER box)
        amb = max(1.0, ambient_of(cur, q) / ambient_of(prev, q))
        adj = raw / amb
        if adj > REGRESSION_X:
            regressions.append((q, p, c, raw, adj))
        elif raw < 1 / REGRESSION_X:
            improvements.append((q, p, c, raw))
    regressions.sort(key=lambda r: -r[4])
    improvements.sort(key=lambda r: r[3])

    lines = []
    lines.append(f"# Bench diff: {prev_p} -> {cur_p}")
    lines.append("")
    lines.append(
        f"- totals: {prev['value']:.1f}s over {len(pq)} queries -> "
        f"{cur['value']:.1f}s over {len(cq)} queries "
        f"(fixtures {prev.get('fixtures_total', 0):.1f}s -> "
        f"{cur.get('fixtures_total', 0):.1f}s)")
    lines.append(
        f"- run-wide loadavg: {prev.get('load_start', '?')} -> "
        f"{cur.get('load_start', '?')} at start")
    lines.append(
        f"- shared {len(shared)}, added {len(added)}, "
        f"dropped {len(dropped)}")
    lines.append("")
    lines.append(f"## Regressions > {REGRESSION_X}x (ambient-adjusted)")
    lines.append("")
    if not regressions:
        lines.append("None.")
    else:
        lines.append("| query | prev s | cur s | raw x | adj x |")
        lines.append("|---|---|---|---|---|")
        for q, p, c, raw, adj in regressions:
            lines.append(
                f"| {q} | {p:.3f} | {c:.3f} | {raw:.2f} | {adj:.2f} |")
    lines.append("")
    lines.append(f"## Improvements > {REGRESSION_X}x")
    lines.append("")
    if not improvements:
        lines.append("None.")
    else:
        lines.append("| query | prev s | cur s | x |")
        lines.append("|---|---|---|---|")
        for q, p, c, raw in improvements[:20]:
            lines.append(f"| {q} | {p:.3f} | {c:.3f} | {raw:.2f} |")
        if len(improvements) > 20:
            lines.append(f"| … {len(improvements) - 20} more | | | |")
    lines.append("")
    if added:
        lines.append(f"## Added ({len(added)})")
        lines.append("")
        lines.append(", ".join(added))
        lines.append("")
    if dropped:
        lines.append(f"## Dropped ({len(dropped)})")
        lines.append("")
        lines.append(", ".join(dropped))
        lines.append("")
    report = "\n".join(lines) + "\n"
    if out_p:
        with open(out_p, "w") as f:
            f.write(report)
    print(report)
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Cross-round bench regression tracker (round 17, VERDICT task 5).

Joins two bench_out.json snapshots per-id, normalizes the newer run by
the ambience controls (fn_json, agg_count — trivial ids whose cost is
pure host weather), and flags only ids whose normalized delta exceeds
their RECORDED median-of-3 spread — the adjudication that previously
took manual history-digging per id (the tfidf_topk 0.22->0.72 question
in round 16 was pure window ambience; this tool answers it mechanically).

Usage:
  python3 tools/bench_diff.py OLD NEW [--out report.md]
where OLD/NEW are bench_out.json paths or git:REV (reads
`git show REV:bench_out.json`). Typical round close:
  python3 tools/bench_diff.py git:<prev-round-close-sha> bench_out.json

Flag rule: an id is a finding iff
  |t_new - r*t_old| > max(spread_old, spread_new, 0.05 s)  AND
  t_new / (r*t_old) outside [1/1.3, 1.3]
with r = the MEDIAN per-id new/old ratio over all shared ids (the
ambience multiplier; the two named controls are printed for context
only). Both conditions must hold: the spread bound kills noisy ids,
the ratio bound kills big-but-cheap absolute jitter on sub-0.1 s ids.
"""
import json
import math
import subprocess
import sys

CONTROLS = ["fn_json", "agg_count"]


def load(spec):
    if spec.startswith("git:"):
        raw = subprocess.check_output(
            ["git", "show", f"{spec[4:]}:bench_out.json"], cwd=".")
        return json.loads(raw)
    with open(spec) as f:
        return json.load(f)


def main():
    argv = sys.argv[1:]
    out_md = None
    if "--out" in argv:
        i = argv.index("--out")
        out_md = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old, new = load(args[0]), load(args[1])
    qo, qn = old["queries"], new["queries"]
    so, sn = old.get("spreads", {}), new.get("spreads", {})

    # Ambience multiplier: the MEDIAN per-id ratio over all shared ids —
    # robust self-normalization (uniform host-weather drift moves the
    # median; real per-id regressions are the deviations from it). The
    # two named controls are printed for context but two points are too
    # few to estimate a window (the r15/r16 snapshots differ by ~0.7x on
    # the quiet bulk while fn_json alone said 1.13x).
    shared = sorted(set(qo) & set(qn))
    all_ratios = sorted(qn[q] / qo[q] for q in shared if qo[q] > 0)
    r = all_ratios[len(all_ratios) // 2] if all_ratios else 1.0

    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    rows = []
    for qid in sorted(set(qo) & set(qn)):
        base = r * qo[qid]
        delta = qn[qid] - base
        bound = max(so.get(qid, 0.0), sn.get(qid, 0.0), 0.05)
        ratio = qn[qid] / base if base > 0 else float("inf")
        flagged = abs(delta) > bound and (ratio > 1.3 or ratio < 1 / 1.3)
        rows.append((qid, qo[qid], qn[qid], base, delta, bound, ratio, flagged))

    flags = [x for x in rows if x[7]]
    flags.sort(key=lambda x: -abs(x[4]))
    lines = []
    lines.append(f"# bench diff: {args[0]} -> {args[1]}")
    lines.append(f"ambience multiplier r = {r:.3f} "
                 f"(controls {', '.join(f'{c}: {qo[c]:.3f}->{qn[c]:.3f}' for c in CONTROLS if c in qo and c in qn)})")
    # Shared ids ONLY on both sides of the normalized ratio — including
    # newly added ids in the numerator inflated it every time the board
    # grew (round-18 ADVICE).
    shared_ratio = (sum(qn[q] for q in shared) /
                    (r * sum(qo[q] for q in shared))) if shared else 1.0
    lines.append(f"totals: {old.get('value', 0):.1f}s/{len(qo)} ids -> "
                 f"{new.get('value', 0):.1f}s/{len(qn)} ids; "
                 f"normalized total ratio (shared ids) = {shared_ratio:.3f}")
    if added:
        lines.append(f"added ids ({len(added)}): {', '.join(added)}")
    if removed:
        lines.append(f"removed ids ({len(removed)}): {', '.join(removed)}")
    lines.append("")
    if not flags:
        lines.append("NO FLAGS: every per-id delta sits inside its recorded "
                     "spread after ambience normalization.")
    else:
        lines.append(f"{len(flags)} flagged ids (normalized delta beyond recorded spread AND >30% ratio):")
        lines.append("")
        lines.append("| id | old s | new s | expected (r*old) | delta | spread bound | ratio |")
        lines.append("|---|---|---|---|---|---|---|")
        for qid, o, n, base, d, b, ratio, _ in flags:
            lines.append(f"| {qid} | {o:.3f} | {n:.3f} | {base:.3f} | "
                         f"{d:+.3f} | {b:.3f} | {ratio:.2f}x |")
    report = "\n".join(lines)
    print(report)
    if out_md:
        with open(out_md, "w") as f:
            f.write(report + "\n")
    sys.exit(0 if not flags else 1)


if __name__ == "__main__":
    main()

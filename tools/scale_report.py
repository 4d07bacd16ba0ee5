#!/usr/bin/env python3
"""Turn graft.ScaleBench output (scale_runs.jsonl) into the scaling-ratio
table behind SCALE_r13.md.

Usage: scale_report.py scale_runs.jsonl BASE_DIR SCALED_DIR FACTOR

For every query present under both dirs, prints time and shuffle-byte
ratios (scaled / base) against the data factor. A time ratio well above
the factor flags super-linear behavior worth a plan read; a shuffle-byte
ratio ~factor means the shuffle volume is data-proportional (the scale-out
friendly shape).
"""
import json
import sys


def main() -> None:
    path, base_dir, scaled_dir, factor = (
        sys.argv[1], sys.argv[2], sys.argv[3], float(sys.argv[4]))
    runs = [json.loads(l) for l in open(path) if l.strip()]
    by = {(r["dir"], r["query"]): r for r in runs}
    names = sorted({r["query"] for r in runs})
    rows = []
    for q in names:
        b, s = by.get((base_dir, q)), by.get((scaled_dir, q))
        if not b or not s:
            continue
        tr = s["sec"] / b["sec"] if b["sec"] > 0 else float("inf")
        sw = (s["shuffle_write"] / b["shuffle_write"]
              if b["shuffle_write"] > 0 else float("nan"))
        rows.append((q, b["sec"], s["sec"], tr, b["shuffle_write"],
                     s["shuffle_write"], sw))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | t@1x (s) | t@{factor:g}x (s) | time ratio | "
          f"shw@1x (MB) | shw@{factor:g}x (MB) | shuffle ratio |")
    print("|---|---|---|---|---|---|---|")
    for q, tb, ts, tr, wb, ws, wr in rows:
        wr_s = f"{wr:.1f}" if wr == wr else "-"
        print(f"| {q} | {tb:.2f} | {ts:.2f} | **{tr:.1f}x** | "
              f"{wb/1e6:.1f} | {ws/1e6:.1f} | {wr_s} |")
    trs = [r[3] for r in rows]
    if trs:
        import statistics
        print(f"\nmedian time ratio {statistics.median(trs):.2f}x, "
              f"max {max(trs):.2f}x at data factor {factor:g}x "
              f"({len(rows)} queries)")


if __name__ == "__main__":
    main()

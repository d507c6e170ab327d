#!/usr/bin/env python
"""Bracket-relative A/B ratios from tools/bench_interleaved_ab.sh output.

The virtualized TPU backend's farm speed drifts +/-30% on minute
timescales (measured 510 -> 717 imgs/s between adjacent default runs),
which swamps single-flag effects in absolute numbers. Each variant run
is bracketed by default runs <=3 min away; this reports, per variant,
the ratio of the variant's sustained throughput to the MEAN of its two
adjacent defaults, plus the bracket spread so the noise floor is
visible next to the effect size.

Usage: python tools/bench_ab_report.py docs/bench_r4/interleaved.tsv [--markdown]
"""
import argparse
import math
import sys


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 4:
                continue
            try:  # failed runs (e.g. tunnel outage) leave empty fields
                rows.append((parts[0], parts[1], float(parts[2]), float(parts[3])))
            except ValueError:
                print(f"skipping failed run row: {line.rstrip()}", file=sys.stderr)
    return rows


def pairs(rows):
    """(variant_tag, variant_sustained, bracket_mean, bracket_spread) per
    variant run with a default on both sides."""
    out = []
    for i, (_, tag, sust, _) in enumerate(rows):
        if tag == "default":
            continue
        before = next(((t, s) for t, s in ((rows[j][1], rows[j][2])
                       for j in range(i - 1, -1, -1)) if t == "default"), None)
        after = next(((t, s) for t, s in ((rows[j][1], rows[j][2])
                      for j in range(i + 1, len(rows))) if t == "default"), None)
        if before and after:
            lo, hi = sorted((before[1], after[1]))
            out.append((tag, sust, (lo + hi) / 2.0, (hi - lo) / ((lo + hi) / 2.0)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()
    rows = load(args.tsv)
    defaults = [s for _, t, s, _ in rows if t == "default"]
    per_tag = {}
    for tag, sust, mean, spread in pairs(rows):
        per_tag.setdefault(tag, []).append((sust / mean, spread))
    if not per_tag:
        print("no bracketed variant runs found", file=sys.stderr)
        return 1
    print(f"defaults: n={len(defaults)} min={min(defaults):.0f} "
          f"max={max(defaults):.0f} (drift {max(defaults)/min(defaults):.2f}x)")
    if args.markdown:
        print("| Variant | runs | variant/bracket ratio (geomean) | per-run ratios | bracket drift |")
        print("|---|---|---|---|---|")
    for tag, rs in sorted(per_tag.items()):
        ratios = [r for r, _ in rs]
        spreads = [sp for _, sp in rs]
        gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
        if args.markdown:
            print(f"| `{tag}` | {len(ratios)} | {gm:.3f} | "
                  + ", ".join(f"{r:.3f}" for r in ratios)
                  + f" | {max(spreads)*100:.0f}% |")
        else:
            print(f"{tag}: geomean ratio {gm:.3f} over {len(ratios)} runs "
                  f"({', '.join(f'{r:.3f}' for r in ratios)}); "
                  f"max bracket drift {max(spreads)*100:.0f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())

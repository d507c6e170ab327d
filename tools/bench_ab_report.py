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


def _minutes(ts):
    """HH:MM:SS -> minutes since midnight (None if unparseable)."""
    try:
        h, m, s = ts.split(":")
        return int(h) * 60 + int(m) + int(s) / 60.0
    except Exception:
        return None


def _within(ts_a, ts_b, max_min):
    a, b = _minutes(ts_a), _minutes(ts_b)
    if a is None or b is None:
        return True  # unstamped legacy rows: keep old behavior
    d = abs(a - b)
    return min(d, 24 * 60 - d) <= max_min  # midnight wrap


def pairs(rows, max_bracket_min=8.0):
    """(variant_tag, variant_sustained, bracket_mean, bracket_spread) per
    variant run with a default on both sides. Brackets farther than
    ``max_bracket_min`` from the variant are discarded: load() drops
    failed runs, so nearest-by-index could otherwise pair against a
    default hours away in a different farm-load regime (advisor r4)."""
    out = []
    for i, (ts, tag, sust, _) in enumerate(rows):
        if tag == "default":
            continue
        before = next(((t, s) for rt, t, s in ((rows[j][0], rows[j][1], rows[j][2])
                       for j in range(i - 1, -1, -1))
                       if t == "default" and _within(ts, rt, max_bracket_min)), None)
        after = next(((t, s) for rt, t, s in ((rows[j][0], rows[j][1], rows[j][2])
                      for j in range(i + 1, len(rows)))
                      if t == "default" and _within(ts, rt, max_bracket_min)), None)
        if before and after:
            lo, hi = sorted((before[1], after[1]))
            out.append((tag, sust, (lo + hi) / 2.0, (hi - lo) / ((lo + hi) / 2.0)))
        else:
            print(f"unbracketed variant run dropped: {ts} {tag} "
                  f"(no default within {max_bracket_min:.0f} min on both sides)",
                  file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tsv")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--max-bracket-min", type=float, default=8.0,
                    help="discard brackets whose defaults are farther than "
                         "this many minutes from the variant run")
    args = ap.parse_args()
    rows = load(args.tsv)
    defaults = [s for _, t, s, _ in rows if t == "default"]
    per_tag = {}
    for tag, sust, mean, spread in pairs(rows, args.max_bracket_min):
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

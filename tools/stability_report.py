#!/usr/bin/env python
"""Summarize a training run's stability from its committed artifacts.

Reads ``<run_dir>/stats.jsonl`` (per-tick training_stats, utils/stats.py)
and any ``<run_dir>/metric-*.jsonl`` (metric_main dispatcher output) and
prints, per loss/metric: first / 25% / mid / 75% / last values, the
overall trend, and NaN/Inf counts — the evidence the reference surfaces
as TensorBoard curves over its 25,000-kimg runs
(reference training/training_loop.py:404-435).

Usage:  python tools/stability_report.py runs_stability/00002--batch16
        [--markdown]   # emit a Markdown table for docs
"""
import argparse
import glob
import json
import math
import os
import sys


def _load_jsonl(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def _series(rows):
    """{key: [(kimg, mean)]} for every Loss/* and Progress scalar."""
    out = {}
    for r in rows:
        kimg = r.get("kimg", 0.0)
        for k, v in r.items():
            if isinstance(v, dict) and "mean" in v:
                out.setdefault(k, []).append((kimg, float(v["mean"])))
    return out


def _fmt(x):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return "nan"
    return f"{x:.4g}"


def report(run_dir, markdown=False):
    stats_path = os.path.join(run_dir, "stats.jsonl")
    if not os.path.isfile(stats_path):
        sys.exit(f"no stats.jsonl under {run_dir}")
    rows = _load_jsonl(stats_path)
    series = _series(rows)
    n_ticks = len(rows)
    kimg_last = rows[-1].get("kimg", 0.0) if rows else 0.0

    sec_per_kimg = [r["sec_per_kimg"] for r in rows[1:] if "sec_per_kimg" in r]
    print(f"run: {run_dir}")
    print(f"ticks: {n_ticks}   kimg: {kimg_last:.1f}")
    if sec_per_kimg:
        s = sorted(sec_per_kimg)
        print(f"sec/kimg (post-compile): median {s[len(s)//2]:.1f}  "
              f"min {s[0]:.1f}  max {s[-1]:.1f}")

    bad = 0
    for k, pts in series.items():
        bad += sum(1 for _, v in pts if not math.isfinite(v))
    print(f"non-finite loss values: {bad}")

    hdr = ["loss", "first", "q25", "mid", "q75", "last", "trend"]
    if markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
    else:
        print(f"{hdr[0]:<42}" + "".join(f"{h:>10}" for h in hdr[1:]))
    for k in sorted(series):
        if not k.startswith("Loss/"):
            continue
        vals = [v for _, v in series[k]]
        if len(vals) < 2:
            continue
        q = lambda f: vals[min(len(vals) - 1, int(f * (len(vals) - 1)))]
        first, last = vals[0], vals[-1]
        # Trend word AND drift both over the second half (ignores the
        # noisy warmup — first-vs-last would call an early spike "down").
        half = vals[len(vals) // 2:]
        drift = (half[-1] - half[0]) / (abs(half[0]) + 1e-8)
        trend = "down" if drift < -0.05 else "up" if drift > 0.05 else "flat"
        cells = [k, _fmt(first), _fmt(q(0.25)), _fmt(q(0.5)), _fmt(q(0.75)),
                 _fmt(last), f"{trend} ({drift:+.0%} 2nd half)"]
        if markdown:
            print("| " + " | ".join(cells) + " |")
        else:
            print(f"{cells[0]:<42}" + "".join(f"{c:>10}" for c in cells[1:6])
                  + f"  {cells[6]}")

    for mpath in sorted(glob.glob(os.path.join(run_dir, "metric-*.jsonl"))):
        name = os.path.basename(mpath)[len("metric-"):-len(".jsonl")]
        mrows = _load_jsonl(mpath)
        pts = []
        for r in mrows:
            res = r.get("results", r)
            kimg = r.get("snapshot_kimg", r.get("kimg"))
            if kimg is None and r.get("snapshot_path"):
                digits = "".join(c for c in os.path.basename(
                    str(r["snapshot_path"])) if c.isdigit())
                kimg = int(digits) if digits else None
            for rk, rv in (res.items() if isinstance(res, dict) else []):
                if isinstance(rv, (int, float)):
                    pts.append((rk, kimg, float(rv)))
        if pts:
            print(f"\nmetric {name}:")
            keys = sorted({p[0] for p in pts})
            for rk in keys:
                seq = [(k2, v) for (r2, k2, v) in pts if r2 == rk]
                traj = "  ".join(f"{_fmt(v)}" for _, v in seq)
                print(f"  {rk:<32} {traj}")


def _metric_series(run_dir):
    """{metric_key: [(kimg, value)]} from every metric-*.jsonl."""
    out = {}
    for mpath in sorted(glob.glob(os.path.join(run_dir, "metric-*.jsonl"))):
        for r in _load_jsonl(mpath):
            res = r.get("results", r)
            kimg = r.get("snapshot_kimg", r.get("kimg"))
            if kimg is None and r.get("snapshot_path"):
                digits = "".join(c for c in os.path.basename(
                    str(r["snapshot_path"])) if c.isdigit())
                kimg = int(digits) if digits else None
            if kimg is None or not isinstance(res, dict):
                continue
            for rk, rv in res.items():
                if isinstance(rv, (int, float)) and math.isfinite(rv):
                    out.setdefault(rk, []).append((float(kimg), float(rv)))
    return {k: sorted(v) for k, v in out.items()}


# Validated categorical palette (dataviz reference instance, light mode).
_BLUE, _ORANGE, _AQUA = "#2a78d6", "#eb6834", "#1baf7a"
_SURFACE, _INK, _INK2 = "#fcfcfb", "#0b0b0b", "#52514e"


def plot(run_dir, out_png):
    """Small-multiple curves (one series per panel; the adversarial-
    balance panel carries a legend) + sec/kimg distribution + metric
    trajectories — the evidence the reference surfaces as TensorBoard
    curves over its 25,000-kimg runs (training_loop.py:445-452)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = _load_jsonl(os.path.join(run_dir, "stats.jsonl"))
    series = _series(rows)
    metrics = _metric_series(run_dir)
    sec_per_kimg = [r["sec_per_kimg"] for r in rows[1:] if "sec_per_kimg" in r]

    adv = [("Loss/D/loss_Dreal", "D real", _BLUE),
           ("Loss/D/loss_Dgen", "D gen", _ORANGE),
           ("Loss/G/loss_gen", "G adv", _AQUA)]
    # The round-4 74-kimg run ended with the UNCONDITIONAL D starting to
    # win (Ggen_uncond +70%, signs/fake drifting to -0.4, VERDICT r4
    # weak-4); give that trend its own combined panel so a longer run
    # shows at a glance whether it re-equilibrates or diverges.
    uncond = [("Loss/G/loss_Ggen_uncond", "G uncond adv", _BLUE),
              ("Loss/signs/fake", "signs/fake (D side)", _ORANGE)]
    have_uncond = any(k in series for k, _, _ in uncond)
    solo_keys = [k for k in sorted(series)
                 if k.startswith("Loss/") and k not in {a[0] for a in adv}
                 and len(series[k]) >= 2]
    panels = (1 + (1 if have_uncond else 0) + len(solo_keys)
              + (1 if sec_per_kimg else 0) + len(metrics))
    ncols = 3
    nrowp = (panels + ncols - 1) // ncols
    fig, axes = plt.subplots(nrowp, ncols, figsize=(4.2 * ncols, 2.9 * nrowp),
                             facecolor=_SURFACE)
    axes = [ax for row in (axes if nrowp > 1 else [axes]) for ax in row]

    def style(ax, title):
        ax.set_facecolor(_SURFACE)
        ax.set_title(title, fontsize=9, color=_INK, loc="left")
        ax.tick_params(labelsize=7, colors=_INK2)
        ax.grid(True, color="#e4e3de", linewidth=0.6)
        ax.set_axisbelow(True)
        for s in ax.spines.values():
            s.set_visible(False)

    i = 0
    ax = axes[i]; i += 1
    for key, label, color in adv:
        if key in series:
            xs, ys = zip(*series[key])
            ax.plot(xs, ys, color=color, linewidth=1.8, label=label)
    ax.legend(fontsize=7, frameon=False, labelcolor=_INK2)
    style(ax, "adversarial balance (vs kimg)")

    if have_uncond:
        ax = axes[i]; i += 1
        for key, label, color in uncond:
            if key in series:
                xs, ys = zip(*series[key])
                ax.plot(xs, ys, color=color, linewidth=1.8, label=label)
        ax.legend(fontsize=7, frameon=False, labelcolor=_INK2)
        style(ax, "uncond-D trend (r4 watch item)")

    for k in solo_keys:
        ax = axes[i]; i += 1
        xs, ys = zip(*series[k])
        ax.plot(xs, ys, color=_BLUE, linewidth=1.8)
        style(ax, k)

    if sec_per_kimg:
        ax = axes[i]; i += 1
        ax.hist(sec_per_kimg, bins=min(20, max(5, len(sec_per_kimg) // 4)),
                color=_BLUE, edgecolor=_SURFACE, linewidth=2)
        style(ax, "sec/kimg distribution (post-compile ticks)")

    for mk, pts in metrics.items():
        ax = axes[i]; i += 1
        xs, ys = zip(*pts)
        ax.plot(xs, ys, color=_BLUE, linewidth=1.8, marker="o", markersize=4)
        style(ax, f"{mk} (vs kimg)")

    for ax in axes[i:]:
        ax.set_visible(False)
    fig.suptitle(f"stability run: {os.path.basename(os.path.abspath(run_dir))}",
                 fontsize=11, color=_INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    fig.savefig(out_png, dpi=140, facecolor=_SURFACE)
    print(f"wrote {out_png} ({panels} panels)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--plot", metavar="OUT_PNG", default=None,
                    help="write loss/metric/sec-per-kimg curve panels as PNG")
    a = ap.parse_args()
    report(a.run_dir, markdown=a.markdown)
    if a.plot:
        plot(a.run_dir, a.plot)

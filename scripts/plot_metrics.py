#!/usr/bin/env python
"""Plot training curves from a run's metrics.jsonl (the always-on metrics
sink — trainer/logger.py writes it whether or not wandb is enabled).

Usage:
  python scripts/plot_metrics.py logs/LidarSpread/dgppo/<run>/ [out.png]
  python scripts/plot_metrics.py <run_dir> --keys eval/reward eval/unsafe_frac
"""
import argparse
import json
import os
import sys

DEFAULT_KEYS = ["eval/reward", "eval/cost", "eval/unsafe_frac", "policy/loss", "Vl/loss"]


def load_metrics(run_dir: str):
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.isfile(path):
        sys.exit(f"no metrics.jsonl under {run_dir}")
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--keys", nargs="*", default=None)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = load_metrics(args.run_dir)
    available = sorted({k for r in rows for k in r if k != "step"})
    if args.keys is not None:
        missing = [k for k in args.keys if k not in available]
        if missing or not args.keys:
            sys.exit(f"keys not present: {missing or '(none given)'}; available: {available}")
        keys = args.keys
    else:
        keys = [k for k in DEFAULT_KEYS if k in available]
    if not keys:
        sys.exit(f"no default keys present; available: {available}")

    fig, axes = plt.subplots(len(keys), 1, figsize=(8, 2.2 * len(keys)), sharex=True)
    if len(keys) == 1:
        axes = [axes]
    for ax, key in zip(axes, keys):
        pts = [(r["step"], r[key]) for r in rows if key in r]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, lw=1.2)
        ax.set_ylabel(key, fontsize=8)
        ax.grid(True, alpha=0.3)
    axes[-1].set_xlabel("training step")
    fig.suptitle(os.path.basename(os.path.normpath(args.run_dir)))
    fig.tight_layout()

    out = args.out or os.path.join(args.run_dir, "metrics.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({len(keys)} panels, {len(rows)} rows)")


if __name__ == "__main__":
    main()

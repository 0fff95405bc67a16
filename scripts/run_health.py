#!/usr/bin/env python
"""Print a one-line health summary of a training run's metrics.jsonl.

Usage: python scripts/run_health.py <run_dir>

Reports the latest step, eval reward/unsafe_frac, policy entropy, and the
collapse diagnostics that distinguish "destabilized but recoverable" from
"pinned at the sigma floor" (PARITY.md, LidarSpread seed-0 negative): entropy
below the ~-11.5/dim event horizon with a flat trajectory means the
entropy-bonus gradient has vanished and the run will not recover.
"""
import json
import sys


def main(run_dir: str) -> None:
    rows = []
    with open(f"{run_dir}/metrics.jsonl") as f:
        for line in f:
            rows.append(json.loads(line))
    ur = [r for r in rows if "policy/entropy" in r]
    ev = [r for r in rows if "eval/unsafe_frac" in r]
    if not ur:
        print("no update rows yet")
        return
    last = ur[-1]
    ents = [r["policy/entropy"] for r in ur]
    step = last["step"]
    # entropy over the most recent ~25% of updates, to see the trend
    tail = ents[-max(1, len(ents) // 4):]
    nf = sum(r.get("policy/has_nan", 0) for r in ur)
    msg = (
        f"step {step}  entropy {last['policy/entropy']:.2f} "
        f"(tail min {min(tail):.2f} max {max(tail):.2f})  "
        f"nan_updates {int(nf)}  "
        f"delta_norm {last.get('opt/params_delta_norm', float('nan')):.4f}"
    )
    if ev:
        e = ev[-1]
        msg += f"  eval@{e['step']}: reward {e['eval/reward']:.3f} unsafe {e['eval/unsafe_frac']:.2f}"
    print(msg)
    if min(tail) < -15 and max(tail) < -15 and step > 4000:
        print("VERDICT: COLLAPSED (entropy pinned below -15; sigma-floor basin)")
    elif last["policy/entropy"] < -8:
        print("VERDICT: AT-RISK (deep entropy dip; watch next check)")
    else:
        print("VERDICT: HEALTHY")


if __name__ == "__main__":
    main(sys.argv[1])

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
import os
import sys

# action_dim per registered env (env/<family>/*.py; the logged policy/entropy
# is the per-agent SUM over action dims, while the collapse thresholds in
# EntropyCollapseMonitor are per-dim — r4 advisor: raw thresholds silently
# assumed 2 dims). Envs not listed fall back to 2.
ACTION_DIMS = {
    "MPETarget": 2, "MPESpread": 2, "MPELine": 2, "MPEFormation": 2,
    "MPECorridor": 2, "MPEConnectSpread": 2,
    "LidarTarget": 2, "LidarSpread": 2, "LidarLine": 2, "LidarBicycleTarget": 2,
    "LidarOmniTarget": 3,
    "VMASReverseTransport": 2, "VMASWheel": 2,
}


def action_dim_for(run_dir: str) -> int:
    try:
        import yaml

        with open(os.path.join(run_dir, "config.yaml")) as f:
            cfg = yaml.safe_load(f)
        return ACTION_DIMS.get(cfg.get("env"), 2)
    except Exception:
        return 2


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
    # Per-dim thresholds shared with EntropyCollapseMonitor (-9.5 terminal,
    # -6 deep): raw-entropy cuts would misread 1-dim and 3+-dim action envs.
    dim = action_dim_for(run_dir)
    tail_min_pd, tail_max_pd = min(tail) / dim, max(tail) / dim
    last_pd = last["policy/entropy"] / dim
    if tail_min_pd < -9.5 and tail_max_pd < -9.5 and step > 4000:
        print(f"VERDICT: COLLAPSED (entropy pinned below -9.5/dim at {dim} dims; sigma-floor basin)")
    elif last_pd < -6:
        print(f"VERDICT: AT-RISK (entropy {last_pd:.1f}/dim; watch next check)")
    else:
        print("VERDICT: HEALTHY")


if __name__ == "__main__":
    main(sys.argv[1])

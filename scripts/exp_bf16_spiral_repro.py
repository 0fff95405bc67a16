"""Reproduce (and verify the fix for) the r3 --bf16 death spiral on CPU.

Loads the ACTUAL collapsed-policy checkpoint from the failed round-3 bf16 run
(logs/MPETarget/dgppo/seed0_819110834_QTBY, first NaN update at step 17,459;
2,537/20,001 policy updates non-finite afterwards), collects a small bf16
rollout with it, and runs DGPPO updates.

  python scripts/exp_bf16_spiral_repro.py            # clamp active (the fix)
  python scripts/exp_bf16_spiral_repro.py --no-clamp # r3 behavior (repro)

Expected: --no-clamp produces non-finite policy grads / a climbing
notfinite_count within a few updates (the spiral); the default stays finite
with a live optimizer. Evidence recorded in PARITY.md / COVERAGE.md.
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CKPT = "logs/MPETarget/dgppo/seed0_819110834_QTBY/models"
STEP = 17450  # last checkpoint before the first non-finite update (17,459)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-clamp", action="store_true", help="disable the PPO log-ratio clamp (reproduce r3)")
    ap.add_argument("--updates", type=int, default=8)
    ap.add_argument("--n-env", type=int, default=8)
    ap.add_argument("--max-step", type=int, default=32)
    args = ap.parse_args()

    if args.no_clamp:
        from dgppo_fov_tpu.algo import pipeline

        pipeline.PPO_LOG_RATIO_CLAMP = float("inf")

    import jax.random as jr
    import numpy as np

    from dgppo_fov_tpu.algo import make_algo
    from dgppo_fov_tpu.env import make_env

    np.random.seed(0)
    env = make_env("MPETarget", num_agents=3, num_obs=3, max_step=args.max_step)
    algo = make_algo(
        algo="dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim, n_agents=3,
        batch_size=args.n_env * args.max_step // 2, rnn_step=16, seed=0,
        train_steps=20000, compute_dtype="bfloat16",
    )
    algo.load(CKPT, STEP)
    print(f"loaded collapsed bf16 policy from {CKPT}/{STEP}; clamp={'OFF' if args.no_clamp else 'ON'}")

    for i in range(args.updates):
        keys = jr.split(jr.PRNGKey(100 + i), args.n_env)
        rollout = algo.collect(algo.params, keys)
        info = algo.update(rollout, step=STEP + i)
        nf = int(algo.policy_train_state.opt_state.notfinite_count)
        print(
            f"update {i}: policy/loss={float(info['policy/loss']):.4g} "
            f"has_nan={float(info['policy/has_nan']):.0f} "
            f"entropy={float(info['policy/entropy']):.3f} "
            f"log_pi_min={float(info['policy/log_pi_min']):.1f} "
            f"notfinite_count={nf}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Evaluation CLI: rollout + safety-rate metrics + video.

Behavioral parity reference: /root/reference/test.py:22-193. Flag names and
metric semantics match: per-episode reward sum, max cost, and
safe_rate = 1 - mean_agents(max_t(any_h(cost >= 0))) via env.get_cost over
visited graphs (test.py:103-133); CSV append (test.py:142-146); mp4 render
per episode (test.py:148-159). Config is loaded from config.yaml (we dump a
plain dict; the reference dumps an argparse Namespace with UnsafeLoader —
both are accepted here). The episode-key stream (split PRNGKey(seed) into
1000, slice [:epi][offset:]) reproduces the reference's quirky --offset
slicing, off-by-epi included.
"""
import argparse
import datetime
import os
import pathlib
from typing import NamedTuple

# Flag surface — names and defaults are the reference's CLI contract.
_FLAGS = [
    ("--path", dict(type=str, required=True)),
    ("--no-video", dict(action="store_true", default=False)),
    ("--epi", dict(type=int, default=5)),
    ("--step", dict(type=int, default=None)),
    ("--obs", dict(type=int, default=None)),
    ("--stochastic", dict(action="store_true", default=False)),
    ("--full-observation", dict(action="store_true", default=False)),
    ("--debug", dict(action="store_true", default=False)),
    ("--cpu", dict(action="store_true", default=False)),
    ("--max-step", dict(type=int, default=None)),
    ("--log", dict(action="store_true", default=False)),
    ("--seed", dict(type=int, default=1234)),
    ("--env", dict(type=str, default=None)),
    ("--offset", dict(type=int, default=0)),
    ("--dpi", dict(type=int, default=100)),
]


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    for name, kw in _FLAGS:
        parser.add_argument(name, **kw)
    parser.add_argument("-n", "--num-agents", type=int, default=None)
    parser.add_argument(
        "--load-reference",
        action="store_true",
        default=False,
        help="Treat --path as a log dir of the ORIGINAL reference "
        "(Tw6249/dgppo_fov): its pickled models/<step>/{actor,Vl,Vh}.pkl "
        "are remapped into this framework's fused layouts "
        "(utils/ref_remap.py) and evaluated here.",
    )
    return parser


class RunConfig:
    """config.yaml accessor tolerating both our plain-dict dumps and the
    reference's pickled argparse Namespace."""

    def __init__(self, run_dir: str):
        import yaml

        with open(os.path.join(run_dir, "config.yaml"), "r") as f:
            self._raw = yaml.load(f, Loader=yaml.UnsafeLoader)

    def get(self, key, default=None):
        if isinstance(self._raw, dict):
            return self._raw.get(key, default)
        return getattr(self._raw, key, default)

    def override(self, key, cli_value, default=None):
        return self.get(key, default) if cli_value is None else cli_value


def resolve_step(run_dir: str, requested) -> int:
    """Latest numbered models/<step>/ dir, unless --step pins one."""
    if requested is not None:
        return requested
    entries = os.listdir(os.path.join(run_dir, "models"))
    return max(int(e) for e in entries if e.isdigit())


def _select_backend(args, jax):
    from .backend import apply_backend_overrides

    apply_backend_overrides(jax, cpu=args.cpu, debug=args.debug)


def _restore(algo, args, model_dir: str, step: int) -> None:
    if not args.load_reference:
        algo.load(model_dir, step)
        return
    from ..utils.ref_remap import load_reference_checkpoint

    migrated = load_reference_checkpoint(os.path.join(model_dir, str(step)))
    algo.policy_train_state = algo.policy_train_state.replace(params=migrated["policy"])
    if "Vl" in migrated:
        algo.Vl_train_state = algo.Vl_train_state.replace(params=migrated["Vl"])
    if "Vh" in migrated and hasattr(algo, "Vh_train_state"):
        algo.Vh_train_state = algo.Vh_train_state.replace(params=migrated["Vh"])


class Episode(NamedTuple):
    """One deterministic eval episode's artifacts + headline numbers."""

    reward: float  # sum of per-step team rewards
    cost: float  # max over steps/agents/constraints
    unsafe: "np.ndarray"  # (T, a) any-constraint-violated mask
    safe_rate: float  # 1 - mean_agents(max_t(unsafe))
    rollout: object


def test(args):
    print(f"> Running test.py {args}")
    stamp = datetime.datetime.now().strftime("%m%d-%H%M")
    os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

    import jax

    _select_backend(args, jax)

    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np

    print(f"> devices: {jax.devices()}")
    np.random.seed(args.seed)

    from ..algo import make_algo
    from ..env import make_env
    from ..trainer.rollout import test_rollout
    from ..utils.tree import jax_jit_np

    run_dir = args.path
    cfg = RunConfig(run_dir)
    num_agents = cfg.override("num_agents", args.num_agents)
    env = make_env(
        env_id=cfg.override("env", args.env),
        num_agents=num_agents,
        num_obs=cfg.override("obs", args.obs),
        max_step=args.max_step,
        full_observation=args.full_observation,
        # Divergence from the reference eval CLI (which always raycasts with
        # the default): a run trained with --n-rays N must be evaluated with
        # the same beam count or the lidar observation distribution shifts.
        n_rays=cfg.get("n_rays"),
    )

    step = resolve_step(run_dir, args.step)
    print("step: ", step)

    # Host-side construction (utils/hostinit.py): eval startup skips the
    # eager-init tunnel round-trips; _restore then overwrites the params.
    from ..utils.hostinit import build_on_host

    algo = build_on_host(lambda: make_algo(
        algo=cfg.get("algo"),
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        cost_weight=cfg.get("cost_weight", 0.0),
        actor_gnn_layers=cfg.get("actor_gnn_layers", 2),
        Vl_gnn_layers=cfg.get("Vl_gnn_layers", 2),
        Vh_gnn_layers=cfg.get("Vh_gnn_layers", 1),
        lr_actor=cfg.get("lr_actor", 3e-4),
        lr_Vl=cfg.get("lr_Vl", 1e-3),
        max_grad_norm=2.0,
        seed=cfg.get("seed", 0),
        use_rnn=cfg.get("use_rnn", True),
        rnn_layers=cfg.get("rnn_layers", 1),
        use_lstm=cfg.get("use_lstm", False),
        std_dev_min=cfg.get("std_dev_min", 1e-5),
    ))
    _restore(algo, args, os.path.join(run_dir, "models"), step)
    # Commit the restored (pickled-numpy) params to the device once; without
    # this every jitted eval call re-uploads the uncommitted host arrays.
    from ..utils.hostinit import algo_to_device

    algo_to_device(algo, jax.devices()[0])

    if args.stochastic:
        def act_fn(graph, rnn_state, key):
            action, _, new_rnn_state = algo.step(graph, rnn_state, key)
            return action, new_rnn_state
    else:
        act_fn = algo.act
    act_fn = jax.jit(act_fn)

    # Reference episode-key stream, --offset quirk included.
    episode_keys = jr.split(jr.PRNGKey(args.seed), 1_000)[: args.epi][args.offset :]

    run_episode = jax_jit_np(
        lambda key: test_rollout(
            env, act_fn, algo.init_rnn_state, key, stochastic=args.stochastic
        )
    )
    unsafe_of = jax_jit_np(jax.vmap(lambda graph: jnp.any(env.get_cost(graph) >= 0.0, axis=-1)))

    episodes = []
    for idx in range(args.epi):
        key_x0, _ = jr.split(episode_keys[idx], 2)
        rollout = run_episode(key_x0)
        unsafe = unsafe_of(rollout.graph)
        ep = Episode(
            reward=rollout.rewards.sum(),
            cost=rollout.costs.max(),
            unsafe=unsafe,
            safe_rate=float(1 - unsafe.max(axis=0).mean()),
            rollout=rollout,
        )
        episodes.append(ep)
        print(
            f"epi: {idx}, reward: {ep.reward:.3f}, cost: {ep.cost:.3f}, "
            f"safe rate: {ep.safe_rate * 100:.3f}%"
        )

    # Aggregate safety over all episodes: per-agent "ever unsafe" flags.
    ever_unsafe = np.max(np.stack([ep.unsafe for ep in episodes]), axis=1)
    safe_mean, safe_std = (1 - ever_unsafe).mean(), (1 - ever_unsafe).std()
    rewards = [ep.reward for ep in episodes]
    costs = [ep.cost for ep in episodes]

    print(
        f"reward: {np.mean(rewards):.3f}, min/max reward: {np.min(rewards):.3f}/{np.max(rewards):.3f}, "
        f"cost: {np.mean(costs):.3f}, min/max cost: {np.min(costs):.3f}/{np.max(costs):.3f}, "
        f"safe_rate: {safe_mean * 100:.3f}%"
    )

    if args.log:
        # Reference CSV columns (test.py:142-146), appended per invocation.
        row = (
            f"{env.num_agents},{args.epi},{env.max_episode_steps},"
            f"{env.area_size},{env.params['n_obs']},"
            f"{safe_mean * 100:.3f},{safe_std * 100:.3f}\n"
        )
        with open(os.path.join(run_dir, "test_log.csv"), "a") as f:
            f.write(row)

    if args.no_video:
        return

    videos_dir = pathlib.Path(run_dir) / "videos" / f"{step}"
    videos_dir.mkdir(exist_ok=True, parents=True)
    for idx, ep in enumerate(episodes):
        stem = (
            f"n{num_agents}_epi{idx:02}_reward{ep.reward:.3f}"
            f"_cost{ep.cost:.3f}_sr{ep.safe_rate * 100:.0f}"
        )
        video_path = videos_dir / f"{stamp}_{stem}.mp4"
        written = env.render_video(ep.rollout, video_path, ep.unsafe, {}, dpi=args.dpi)
        # save_anim falls back to .gif when no mp4 writer exists — report
        # the file actually written, not the requested name.
        print(f"video: {written if written is not None else video_path}")


def main():
    from .debug import launch_debugger_on_exception

    with launch_debugger_on_exception():
        test(build_parser().parse_args())


if __name__ == "__main__":
    main()

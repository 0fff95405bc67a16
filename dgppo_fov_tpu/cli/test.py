"""Evaluation CLI: rollout + safety-rate metrics + video.

Behavioral parity reference: /root/reference/test.py:22-193. Flag names and
metric semantics match: per-episode reward sum, max cost, and
safe_rate = 1 - mean_agents(max_t(any_h(cost >= 0))) via env.get_cost over
visited graphs (test.py:103-133); CSV append (test.py:142-146); mp4 render
per episode (test.py:148-159). Config is loaded from config.yaml (we dump a
plain dict; the reference dumps an argparse Namespace with UnsafeLoader —
both are accepted here).
"""
import argparse
import datetime
import functools as ft
import os
import pathlib


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, required=True)
    parser.add_argument("--no-video", action="store_true", default=False)
    parser.add_argument("--epi", type=int, default=5)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--obs", type=int, default=None)
    parser.add_argument("--stochastic", action="store_true", default=False)
    parser.add_argument("--full-observation", action="store_true", default=False)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--cpu", action="store_true", default=False)
    parser.add_argument("--max-step", type=int, default=None)
    parser.add_argument("--log", action="store_true", default=False)
    parser.add_argument("-n", "--num-agents", type=int, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--env", type=str, default=None)
    parser.add_argument("--offset", type=int, default=0)
    parser.add_argument("--dpi", type=int, default=100)
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


def _cfg_get(config, key, default=None):
    if isinstance(config, dict):
        return config.get(key, default)
    return getattr(config, key, default)


def test(args):
    print(f"> Running test.py {args}")
    stamp_str = datetime.datetime.now().strftime("%m%d-%H%M")
    os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

    import jax

    if os.environ.get("DGPPO_JAX_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DGPPO_JAX_PLATFORM"])
    if args.cpu:
        # JAX_PLATFORMS env vars don't stick on images whose sitecustomize
        # prepends an experimental platform — set the config before any
        # backend init instead (must precede the first jax.devices() call).
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np
    import yaml

    if args.debug:
        jax.config.update("jax_disable_jit", True)
    print(f"> devices: {jax.devices()}")
    np.random.seed(args.seed)

    from ..algo import make_algo
    from ..env import make_env
    from ..trainer.rollout import test_rollout
    from ..utils.tree import jax_jit_np

    with open(os.path.join(args.path, "config.yaml"), "r") as f:
        config = yaml.load(f, Loader=yaml.UnsafeLoader)

    num_agents = _cfg_get(config, "num_agents") if args.num_agents is None else args.num_agents
    env = make_env(
        env_id=_cfg_get(config, "env") if args.env is None else args.env,
        num_agents=num_agents,
        num_obs=_cfg_get(config, "obs") if args.obs is None else args.obs,
        max_step=args.max_step,
        full_observation=args.full_observation,
    )

    model_path = os.path.join(args.path, "models")
    if args.step is None:
        models = os.listdir(model_path)
        step = max([int(model) for model in models if model.isdigit()])
    else:
        step = args.step
    print("step: ", step)

    algo = make_algo(
        algo=_cfg_get(config, "algo"),
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        cost_weight=_cfg_get(config, "cost_weight", 0.0),
        actor_gnn_layers=_cfg_get(config, "actor_gnn_layers", 2),
        Vl_gnn_layers=_cfg_get(config, "Vl_gnn_layers", 2),
        Vh_gnn_layers=_cfg_get(config, "Vh_gnn_layers", 1),
        lr_actor=_cfg_get(config, "lr_actor", 3e-4),
        lr_Vl=_cfg_get(config, "lr_Vl", 1e-3),
        max_grad_norm=2.0,
        seed=_cfg_get(config, "seed", 0),
        use_rnn=_cfg_get(config, "use_rnn", True),
        rnn_layers=_cfg_get(config, "rnn_layers", 1),
        use_lstm=_cfg_get(config, "use_lstm", False),
    )
    if args.load_reference:
        from ..utils.ref_remap import load_reference_checkpoint

        migrated = load_reference_checkpoint(os.path.join(model_path, str(step)))
        algo.policy_train_state = algo.policy_train_state.replace(params=migrated["policy"])
        if "Vl" in migrated:
            algo.Vl_train_state = algo.Vl_train_state.replace(params=migrated["Vl"])
        if "Vh" in migrated and hasattr(algo, "Vh_train_state"):
            algo.Vh_train_state = algo.Vh_train_state.replace(params=migrated["Vh"])
    else:
        algo.load(model_path, step)

    if args.stochastic:
        def act_fn(graph, rnn_state, key):
            action, _, new_rnn_state = algo.step(graph, rnn_state, key)
            return action, new_rnn_state
    else:
        act_fn = algo.act
    act_fn = jax.jit(act_fn)
    init_rnn_state = algo.init_rnn_state

    test_key = jr.PRNGKey(args.seed)
    test_keys = jr.split(test_key, 1_000)[: args.epi]
    test_keys = test_keys[args.offset :]

    rollout_fn = ft.partial(test_rollout, env, act_fn, init_rnn_state, stochastic=args.stochastic)
    rollout_fn = jax_jit_np(rollout_fn)

    def unsafe_mask(graph):
        cost = env.get_cost(graph)
        return jnp.any(cost >= 0.0, axis=-1)

    is_unsafe_fn = jax_jit_np(jax.vmap(unsafe_mask))

    rewards, costs, rollouts, is_unsafes, rates = [], [], [], [], []
    for i_epi in range(args.epi):
        key_x0, _ = jr.split(test_keys[i_epi], 2)
        rollout = rollout_fn(key_x0)
        is_unsafes.append(is_unsafe_fn(rollout.graph))

        epi_reward = rollout.rewards.sum()
        epi_cost = rollout.costs.max()
        rewards.append(epi_reward)
        costs.append(epi_cost)
        rollouts.append(rollout)
        safe_rate = 1 - is_unsafes[-1].max(axis=0).mean()
        print(f"epi: {i_epi}, reward: {epi_reward:.3f}, cost: {epi_cost:.3f}, safe rate: {safe_rate * 100:.3f}%")
        rates.append(np.array(safe_rate))

    is_unsafe = np.max(np.stack(is_unsafes), axis=1)
    safe_mean, safe_std = (1 - is_unsafe).mean(), (1 - is_unsafe).std()

    print(
        f"reward: {np.mean(rewards):.3f}, min/max reward: {np.min(rewards):.3f}/{np.max(rewards):.3f}, "
        f"cost: {np.mean(costs):.3f}, min/max cost: {np.min(costs):.3f}/{np.max(costs):.3f}, "
        f"safe_rate: {safe_mean * 100:.3f}%"
    )

    if args.log:
        with open(os.path.join(args.path, "test_log.csv"), "a") as f:
            f.write(
                f"{env.num_agents},{args.epi},{env.max_episode_steps},"
                f"{env.area_size},{env.params['n_obs']},"
                f"{safe_mean * 100:.3f},{safe_std * 100:.3f}\n"
            )

    if args.no_video:
        return

    videos_dir = pathlib.Path(args.path) / "videos" / f"{step}"
    videos_dir.mkdir(exist_ok=True, parents=True)
    for ii, (rollout, Ta_is_unsafe) in enumerate(zip(rollouts, is_unsafes)):
        safe_rate = rates[ii] * 100
        video_name = f"n{num_agents}_epi{ii:02}_reward{rewards[ii]:.3f}_cost{costs[ii]:.3f}_sr{safe_rate:.0f}"
        video_path = videos_dir / f"{stamp_str}_{video_name}.mp4"
        written = env.render_video(rollout, video_path, Ta_is_unsafe, {}, dpi=args.dpi)
        # save_anim falls back to .gif when no mp4 writer exists — report
        # the file actually written, not the requested name.
        print(f"video: {written if written is not None else video_path}")


def main():
    from .debug import launch_debugger_on_exception

    with launch_debugger_on_exception():
        test(build_parser().parse_args())


if __name__ == "__main__":
    main()

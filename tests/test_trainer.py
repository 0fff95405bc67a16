"""Trainer loop, metrics logging, checkpointing, env-registry hygiene."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.env import make_env
from dgppo_fov_tpu.trainer.trainer import Trainer


def test_trainer_short_loop(tmp_path):
    np.random.seed(0)
    env = make_env("MPETarget", num_agents=3, num_obs=0, max_step=8)
    env_test = make_env("MPETarget", num_agents=3, num_obs=0, max_step=8)
    algo = make_algo(
        algo="dgppo",
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=3,
        batch_size=16,
        rnn_step=4,
        seed=0,
        train_steps=2,
    )
    trainer = Trainer(
        env=env,
        env_test=env_test,
        algo=algo,
        gamma=0.99,
        n_env_train=4,
        n_env_test=2,
        log_dir=str(tmp_path),
        seed=0,
        params={"run_name": "t", "training_steps": 1, "eval_interval": 1, "eval_epi": 1, "save_interval": 1},
        save_log=True,
        use_wandb=False,
    )
    trainer.train()

    # Metrics JSONL written with the reference metric names.
    metrics_path = tmp_path / "metrics.jsonl"
    assert metrics_path.exists()
    records = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    keys = set().union(*[set(r) for r in records])
    for name in ["eval/reward", "eval/cost", "eval/unsafe_frac", "policy/loss", "Vl/loss",
                 "perf/env_steps_per_s_per_chip"]:
        assert name in keys, name

    # Optimizer-liveness metrics (VERDICT r3 #6): a live finite update moves
    # the params; apply_if_finite skip counters start at 0.
    live = [r for r in records if "opt/params_delta_norm" in r]
    assert live, "opt/params_delta_norm missing from metrics.jsonl"
    assert live[0]["opt/params_delta_norm"] > 0.0
    for net in ("policy", "Vl", "Vh"):
        assert live[0][f"opt/notfinite_{net}"] == 0

    # Params-only models and full-state checkpoints exist.
    assert (tmp_path / "models" / "0" / "actor.pkl").exists()
    assert any((tmp_path / "ckpt").iterdir())


def test_make_env_does_not_mutate_class_params():
    from dgppo_fov_tpu.env.mpe.mpe_target import MPETarget

    before = dict(MPETarget.PARAMS)
    env = make_env("MPETarget", num_agents=3, num_obs=7)
    assert env.params["n_obs"] == 7
    assert MPETarget.PARAMS == before  # reference mutates this (SURVEY.md §5); we don't


def test_cost_clip_quirks():
    """MPE clips min only; Lidar clips both sides (reference quirk, SURVEY.md §7)."""
    import jax.numpy as jnp
    import jax.random as jr

    mpe = make_env("MPETarget", num_agents=3, num_obs=0, max_step=8)
    g = mpe.reset(jr.PRNGKey(0))
    # Force a collision: all agents at the same point -> raw cost 2r = 0.1,
    # margin +0.5 -> 0.6 (positive; MPE applies no upper clip but raw agent
    # costs are bounded by 2r so it never binds).
    st = g.env_states
    agent = jnp.broadcast_to(st.agent[0], st.agent.shape)
    cost = np.asarray(mpe.get_cost(mpe.get_graph(st._replace(agent=agent))))
    np.testing.assert_allclose(cost[:, 0], 0.6, atol=1e-6)

    lidar = make_env("LidarTarget", num_agents=3, max_step=8)
    g = lidar.reset(jr.PRNGKey(0))
    st = g.env_states
    agent = jnp.broadcast_to(st.agent[0], st.agent.shape)
    lidar_data = lidar.get_lidar_data(agent, st.obstacle)
    g2 = lidar.get_graph(st._replace(agent=agent), lidar_data)
    cost = np.asarray(lidar.get_cost(g2))
    assert cost.max() <= 1.0  # Lidar: clipped to [-1, 1]


def test_full_checkpoint_roundtrip_restores_structure(tmp_path):
    """save_checkpoint -> load_checkpoint preserves the optax state structure
    (regression: Orbax restore without a target returned plain dicts and the
    next apply_gradients crashed on ApplyIfFiniteState.inner_state)."""
    import jax.random as jr

    from dgppo_fov_tpu.trainer.checkpoint import load_checkpoint, save_checkpoint

    env = make_env("MPETarget", num_agents=3, num_obs=0, max_step=8)

    def build():
        return make_algo(
            algo="dgppo",
            env=env,
            node_dim=env.node_dim,
            edge_dim=env.edge_dim,
            state_dim=env.state_dim,
            action_dim=env.action_dim,
            n_agents=3,
            batch_size=16,
            rnn_step=4,
            seed=0,
            train_steps=4,
        )

    algo = build()
    rollout = algo.collect(algo.params, jr.split(jr.PRNGKey(0), 4))
    algo.update(rollout, step=0)  # advance optimizer state past init
    path = save_checkpoint(algo, str(tmp_path / "ckpt"), step=1)
    assert os.path.exists(path) or os.path.isdir(path.rstrip("/"))

    algo2 = build()
    step = load_checkpoint(algo2, str(tmp_path / "ckpt"), step=1)
    assert step == 1
    # Structure preserved: namedtuple-typed opt state, same leaf values.
    assert type(algo2.policy_train_state.opt_state) is type(algo.policy_train_state.opt_state)
    a = jax.tree_util.tree_leaves(algo.params["policy"])
    b = jax.tree_util.tree_leaves(algo2.params["policy"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # The real regression check: training continues after restore.
    rollout2 = algo2.collect(algo2.params, jr.split(jr.PRNGKey(1), 4))
    info = algo2.update(rollout2, step=1)
    assert np.isfinite(float(info["policy/loss"]))


def test_checkpoint_retention_policy(tmp_path):
    """prune_checkpoints keeps the newest N plus every K-th step and removes
    the rest; load_checkpoint of a pruned step fails with a clear message
    naming the surviving steps (VERDICT r4 #5: the unpruned rescue run left
    689 full_* dirs; reference never prunes but saves params-only pickles,
    /root/reference/dgppo/algo/informarl_lagr.py:311-317)."""
    from dgppo_fov_tpu.trainer.checkpoint import (
        list_checkpoints,
        load_checkpoint,
        prune_checkpoints,
    )

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    # Mix of orbax-style dirs and pickle fallbacks, like a real run dir.
    steps = list(range(50, 1001, 50))  # 50, 100, ..., 1000
    for s in steps:
        if s % 100 == 0:
            d = ckpt_dir / f"full_{s}"
            d.mkdir()
            (d / "manifest.ocdbt").write_text("x")
        else:
            (ckpt_dir / f"full_{s}.pkl").write_bytes(b"x")
    assert list_checkpoints(str(ckpt_dir)) == steps

    removed = prune_checkpoints(str(ckpt_dir), keep_last=3, keep_every=500)
    survivors = list_checkpoints(str(ckpt_dir))
    assert survivors == [500, 900, 950, 1000]  # every-500th + newest 3
    assert removed == len(steps) - len(survivors)
    # Idempotent: a second prune removes nothing.
    assert prune_checkpoints(str(ckpt_dir), keep_last=3, keep_every=500) == 0
    # keep_last=0 disables pruning entirely.
    assert prune_checkpoints(str(ckpt_dir), keep_last=0, keep_every=1) == 0

    with pytest.raises(FileNotFoundError) as ei:
        load_checkpoint(None, str(ckpt_dir), step=450)
    msg = str(ei.value)
    assert "450" in msg and "pruned" in msg and "500" in msg


def test_trainer_prunes_checkpoints_during_training(tmp_path):
    """A Trainer run with save_interval=1 and keep_last=2/keep_every=4 ends
    with only the retained full_* set on disk while every models/<step>
    params pickle survives."""
    import jax.random as jr

    from dgppo_fov_tpu.trainer.checkpoint import list_checkpoints
    from dgppo_fov_tpu.trainer.trainer import Trainer

    env = make_env("MPETarget", num_agents=2, num_obs=0, max_step=4)
    algo = make_algo(
        algo="dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim, n_agents=2,
        batch_size=8, rnn_step=2, seed=0, train_steps=6,
    )
    log_dir = str(tmp_path / "run")
    trainer = Trainer(
        env=env, env_test=env, algo=algo, gamma=0.99, n_env_train=2,
        n_env_test=2, log_dir=log_dir, seed=0,
        params={
            "run_name": "t", "training_steps": 6, "eval_interval": 100,
            "eval_epi": 1, "save_interval": 1,
            "ckpt_keep_last": 2, "ckpt_keep_every": 4,
        },
        use_wandb=False,
    )
    trainer.train()
    # Steps 0..6 saved; retained = newest 2 (5, 6) + every-4th (0, 4).
    assert list_checkpoints(os.path.join(log_dir, "ckpt")) == [0, 4, 5, 6]
    models = sorted(int(s) for s in os.listdir(os.path.join(log_dir, "models")))
    assert models == list(range(0, 7))  # params pickles never pruned


@pytest.mark.parametrize("env_id", ["MPETarget", "LidarBicycleTarget", "VMASWheel"])
def test_render_video_smoke(env_id, tmp_path):
    """render_video writes a real file and returns the path actually written
    (save_anim falls back to .gif when no mp4 writer exists). Covers the
    circle renderer, the oriented f1tenth car-body renderer
    (LidarBicycleTarget, get_f1tenth_body + MutablePatchCollection), and the
    VMAS renderer."""
    import jax.random as jr

    from dgppo_fov_tpu.trainer.rollout import test_rollout

    env = make_env(env_id, num_agents=3, max_step=4)

    def actor(graph, rnn_state):
        return jnp.zeros((3, env.action_dim)), rnn_state

    rollout = test_rollout(env, actor, jnp.zeros((1, 3, 1, 8)), jr.PRNGKey(0))
    Ta_is_unsafe = np.zeros((4, 3), dtype=bool)
    written = env.render_video(rollout, tmp_path / "vid.mp4", Ta_is_unsafe, {}, dpi=40)
    assert written is not None and os.path.exists(written), written
    assert os.path.getsize(written) > 0


def test_trainer_resume_continues_stream_and_schedule(tmp_path):
    """train(start_step=S) must continue, not replay: the loop feeds `step`
    to algo.update (cost/CBF schedules) and derives the per-step collect
    keys by fold_in(key, step), so a resumed run at step S collects with the
    SAME keys the original run would have used at step S."""
    import jax.random as jr

    def build(log_dir):
        env = make_env("MPETarget", num_agents=3, num_obs=0, max_step=8)
        env_test = make_env("MPETarget", num_agents=3, num_obs=0, max_step=8)
        algo = make_algo(
            algo="dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
            state_dim=env.state_dim, action_dim=env.action_dim, n_agents=3,
            batch_size=16, rnn_step=4, seed=0, train_steps=4,
        )
        return Trainer(
            env=env, env_test=env_test, algo=algo, gamma=0.99,
            n_env_train=4, n_env_test=2, log_dir=log_dir, seed=0,
            params={"run_name": "t", "training_steps": 3, "eval_interval": 10,
                    "eval_epi": 1, "save_interval": 10},
            save_log=False, use_wandb=False, full_checkpoint=False,
        )

    # Step-keyed collect streams: the same (seed, step) gives the same keys
    # regardless of how many earlier iterations ran.
    t = build(None)
    k2_direct = jr.split(jr.fold_in(t.key, 2), t.n_env_train)
    np.random.seed(0)
    t.train(start_step=2)  # runs steps 2..3 only
    t2 = build(None)
    np.random.seed(0)
    k2_after_resume = jr.split(jr.fold_in(t2.key, 2), t2.n_env_train)
    np.testing.assert_array_equal(np.asarray(k2_direct), np.asarray(k2_after_resume))
    assert t.update_steps >= 2  # logger step counter resumed, not reset


def test_chunk_vmap_matches_plain_vmap():
    import jax
    import jax.numpy as jnp

    from dgppo_fov_tpu.utils.tree import chunk_vmap

    x = jnp.arange(22.0).reshape(11, 2)

    def f(row):
        return {"y": row * 3.0, "s": row.sum()}

    plain = jax.vmap(f)(x)
    chunked = chunk_vmap(f, 4)(x)  # 11 not divisible by 4
    np.testing.assert_array_equal(np.asarray(plain["y"]), np.asarray(chunked["y"]))
    np.testing.assert_array_equal(np.asarray(plain["s"]), np.asarray(chunked["s"]))


def test_entropy_collapse_monitor_escalates_once_and_rearms():
    from dgppo_fov_tpu.trainer.utils import EntropyCollapseMonitor

    m = EntropyCollapseMonitor(action_dim=2)
    assert m.check(1.0) is None              # healthy
    deep = m.check(-13.0)                    # -6.5/dim: deep warning
    assert deep is not None and "std-dev-min" in deep
    assert m.check(-14.0) is None            # one-shot: no spam
    terminal = m.check(-22.0)                # -11/dim: terminal warning
    assert terminal is not None and "terminal" in terminal
    assert m.check(-22.0) is None            # one-shot
    assert m.check(0.5) is None              # recovery re-arms deep...
    assert m.check(-13.0) is not None        # ...so a second dip warns again


def test_entropy_collapse_monitor_no_downgrade_after_terminal():
    """A run that collapses STRAIGHT past terminal must not fire the lesser
    'deep' warning on the next check (r4 advisor: escalation downgrade)."""
    from dgppo_fov_tpu.trainer.utils import EntropyCollapseMonitor

    m = EntropyCollapseMonitor(action_dim=2)
    terminal = m.check(-22.0)                # first check is already terminal
    assert terminal is not None and "terminal" in terminal
    assert m.check(-14.0) is None            # deep range: stays silent
    assert m.check(0.5) is None              # recovery re-arms deep
    assert m.check(-13.0) is not None        # second dip warns again


def test_checkpoint_reroll_restores_state_but_not_collect_stream(tmp_path):
    """The rescue workflow PARITY.md documents for collapsed runs: resume a
    full checkpoint under a DIFFERENT CLI seed. Params/optimizer/algo-key and
    the step counter must restore bit-identically (they come from the
    checkpoint), while the trainer's step-keyed collect stream must change
    (it derives from the CLI seed, divergence #8) — a re-roll of the
    rollout dice from the same model state."""
    import jax.random as jr
    import jax.tree_util as jtu

    from dgppo_fov_tpu.trainer.checkpoint import load_checkpoint, save_checkpoint

    def build_algo():
        env = make_env("MPETarget", num_agents=3, num_obs=0, max_step=8)
        return env, make_algo(
            algo="dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
            state_dim=env.state_dim, action_dim=env.action_dim, n_agents=3,
            batch_size=16, rnn_step=4, seed=0, train_steps=4,
        )

    env, src = build_algo()
    # Perturb source state so the restore is distinguishable from fresh init.
    keys = jr.split(jr.PRNGKey(7), 4)
    rollout = src.collect(src.params, keys)
    np.random.seed(0)
    src.update(rollout, step=0)
    save_checkpoint(src, str(tmp_path), step=3)

    _, a = build_algo()
    _, b = build_algo()
    assert load_checkpoint(a, str(tmp_path), 3) == 3
    assert load_checkpoint(b, str(tmp_path), 3) == 3

    # Restored state is bit-identical across the two resumes...
    jtu.tree_map(np.testing.assert_array_equal, a.params, b.params)
    jtu.tree_map(
        np.testing.assert_array_equal,
        jax.device_get(a.policy_train_state.opt_state),
        jax.device_get(b.policy_train_state.opt_state),
    )
    np.testing.assert_array_equal(np.asarray(a.key), np.asarray(b.key))
    # ...and matches the source it was saved from.
    jtu.tree_map(np.testing.assert_array_equal, a.params, src.params)

    # But the TRAINER collect stream is CLI-seed-keyed, not checkpoint-keyed:
    # different seeds give different step-5000 collect keys over identical
    # restored state.
    k_seed0 = jr.split(jr.fold_in(jr.fold_in(jr.PRNGKey(0), 0x636F6C), 5000), 4)
    k_seed42 = jr.split(jr.fold_in(jr.fold_in(jr.PRNGKey(42), 0x636F6C), 5000), 4)
    assert not np.array_equal(np.asarray(k_seed0), np.asarray(k_seed42))

"""Multi-device sharding: full training step over a virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    actions, rnn = out
    assert actions.shape == (8, 3, 2)
    assert np.all(np.isfinite(np.asarray(actions)))


def test_sharded_rollout_matches_unsharded():
    """Sharding the env axis must not change the computed rollout."""
    import jax.random as jr

    from dgppo_fov_tpu.algo import make_algo
    from dgppo_fov_tpu.env import make_env
    from dgppo_fov_tpu.parallel.mesh import make_mesh, shard_batch

    env = make_env("MPETarget", num_agents=3, num_obs=0, max_step=4)
    algo = make_algo(
        algo="informarl",
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        batch_size=16,
        rnn_step=2,
        seed=0,
        train_steps=10,
    )
    keys = jr.split(jr.PRNGKey(0), 8)
    r1 = algo.collect(algo.params, keys)

    mesh = make_mesh()
    keys_sharded = shard_batch(keys, mesh)
    r2 = algo.collect(algo.params, keys_sharded)

    np.testing.assert_allclose(
        np.asarray(r1.rewards), np.asarray(r2.rewards), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r1.actions), np.asarray(r2.actions), rtol=1e-6, atol=1e-6
    )

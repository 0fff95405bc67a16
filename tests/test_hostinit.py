"""Host-side algorithm construction (utils/hostinit.py).

The r4 driver bench died building the algo eagerly on the remote axon
backend (217.8 s wall / ~8 s CPU of per-op tunnel round-trips before any
real compile — VERDICT r4 missing #1a). build_on_host constructs on the
host CPU and ships the state in one batched device_put; these tests pin
that the host-built state is bit-identical to a directly-built one and
that the moved algo still collects/updates.
"""
import jax
import jax.random as jr
import jax.tree_util as jtu
import numpy as np

from dgppo_fov_tpu.algo import make_algo
from dgppo_fov_tpu.env import make_env
from dgppo_fov_tpu.utils.hostinit import algo_to_device, build_on_host


def _builder():
    env = make_env("MPETarget", num_agents=2, num_obs=0, max_step=8)
    return env, make_algo(
        algo="dgppo", env=env, node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim, n_agents=2,
        batch_size=16, rnn_step=4, seed=0, train_steps=10,
    )


def test_build_on_host_params_bit_identical():
    """Constructing under the host CPU default device yields the same params
    as a direct construction (threefry is platform-deterministic and the
    initializers are elementwise over PRNG draws)."""
    _, direct = _builder()
    hosted = build_on_host(lambda: _builder()[1])
    for a, b in zip(
        jtu.tree_leaves(direct.params), jtu.tree_leaves(hosted.params), strict=True
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(direct.key), np.asarray(hosted.key))


def test_algo_to_device_preserves_state_and_trains():
    """algo_to_device rebundles every train state / key / template onto the
    target device without changing values, and the algo still runs a full
    collect+update afterwards."""
    _, algo = _builder()
    before = jax.device_get(
        {"p": algo.params, "k": algo.key, "lagr": getattr(algo, "ah_lagr", None)}
    )
    dev = jax.devices()[0]
    moved = algo_to_device(algo, dev)
    assert moved is algo
    after = jax.device_get(
        {"p": algo.params, "k": algo.key, "lagr": getattr(algo, "ah_lagr", None)}
    )
    for a, b in zip(jtu.tree_leaves(before), jtu.tree_leaves(after), strict=True):
        np.testing.assert_array_equal(a, b)
    for leaf in jtu.tree_leaves(algo.policy_train_state.params):
        assert leaf.devices() == {dev}
    rollout = algo.collect(algo.params, jr.split(jr.PRNGKey(0), 4))
    info = algo.update(rollout, step=0)
    assert np.isfinite(float(info["policy/loss"]))

"""Shared constants and helpers for the reference-parity update tests.

The update-parity modules (test_reference_parity_update*.py) all run the
same protocol on the same tiny MPETarget workload; the expensive shared
inputs (the reference's stochastic + deterministic rollouts and their
conversions to our layout) are collected ONCE per session by the
`parity_rollouts` fixture in conftest.py and reused, so each test pays only
for its own update_inner compiles.
"""
import os
import sys

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

REF_PATH = "/root/reference"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

B, T, N_AGENTS, N_OBS = 4, 8, 3, 2

ALGO_KW = dict(
    n_agents=N_AGENTS,
    cost_weight=0.0,
    batch_size=2 * T,  # 2 envs per minibatch
    rnn_step=4,
    seed=0,
    use_rnn=True,
    coef_ent=0.0,
    train_steps=100,
)
BATCH_IDX = np.array([[0, 1], [2, 3]])


def convert_rollout(env_o, ro_r):
    """Reference Rollout -> our Rollout (same floats, our graph layout),
    env_states stripped (as both updates do)."""
    from dgppo_fov_tpu.env.mpe.base import MPEEnvState
    from dgppo_fov_tpu.trainer.data import Rollout as OurRollout

    def graph_to_ours(g):
        agents = g.type_states(type_idx=0, n_type=N_AGENTS)
        goals = g.type_states(type_idx=1, n_type=N_AGENTS)
        obs = g.type_states(type_idx=2, n_type=N_OBS)
        return env_o.get_graph(MPEEnvState(agents, goals, obs))

    bT_graph = jax.vmap(jax.vmap(graph_to_ours))(ro_r.graph)
    final_ref = jtu.tree_map(lambda x: x[:, -1], ro_r.next_graph)
    b_final = jax.vmap(graph_to_ours)(final_ref)

    ro = OurRollout(
        graph=bT_graph,
        actions=ro_r.actions,
        rnn_states=ro_r.rnn_states,
        rewards=ro_r.rewards,
        costs=ro_r.costs,
        dones=ro_r.dones,
        log_pis=ro_r.log_pis,
        final_graph=b_final,
    )
    return ro._replace(
        graph=ro.graph.without_env_states(), final_graph=ro.final_graph.without_env_states()
    )


def build_pair(algo_name, **overrides):
    """(env_r, env_o, algo_r, algo_o) on the shared tiny MPETarget workload.

    Every algorithm class shares the policy/Vl init key stream, so rollouts
    collected with fresh-init params are identical across algo names — which
    is what lets the session fixture share ONE reference rollout.
    """
    from dgppo.algo import make_algo as ref_make_algo
    from dgppo.env import make_env as ref_make_env

    from dgppo_fov_tpu.algo import make_algo as our_make_algo
    from dgppo_fov_tpu.env import make_env as our_make_env

    kw = dict(ALGO_KW, **overrides)
    env_r = ref_make_env("MPETarget", num_agents=N_AGENTS, num_obs=N_OBS, max_step=T)
    env_o = our_make_env("MPETarget", num_agents=N_AGENTS, num_obs=N_OBS, max_step=T)
    dims = lambda env: dict(
        node_dim=env.node_dim, edge_dim=env.edge_dim,
        state_dim=env.state_dim, action_dim=env.action_dim,
    )
    algo_r = ref_make_algo(algo=algo_name, env=env_r, **dims(env_r), **kw)
    algo_o = our_make_algo(algo=algo_name, env=env_o, **dims(env_o), **kw)
    return env_r, env_o, algo_r, algo_o


def transfer_params(algo_r, algo_o, with_vh: bool):
    """Move the reference's fresh-init params into our train states.

    Deep-copies because both update_inners donate their train-state buffers
    and the remap shares unfused leaves with the reference's param tree.
    """
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    copy = lambda tree: jtu.tree_map(lambda x: jnp.array(x), tree)
    algo_o.policy_train_state = algo_o.policy_train_state.replace(
        params=copy(remap_policy_params(algo_r.params["policy"]))
    )
    algo_o.Vl_train_state = algo_o.Vl_train_state.replace(
        params=copy(remap_value_params(algo_r.params["Vl"]))
    )
    if with_vh:
        algo_o.Vh_train_state = algo_o.Vh_train_state.replace(
            params=copy(remap_value_params(algo_r.params["Vh"]))
        )
    algo_o.key = algo_r.key


def ref_plans(ro_r):
    batch_idx = jnp.array(BATCH_IDX)
    rnn_chunk_ids = jnp.arange(ro_r.dones.shape[1]).reshape(-1, ALGO_KW["rnn_step"])
    return batch_idx, rnn_chunk_ids


def assert_metrics_close(info_r, info_o, keys):
    for k in keys:
        np.testing.assert_allclose(
            float(info_r[k]), float(info_o[k]), rtol=2e-3, atol=2e-4, err_msg=k
        )


def assert_params_close(mapped_ref, ours, label):
    flat_r, _ = jtu.tree_flatten_with_path(mapped_ref)
    flat_o, _ = jtu.tree_flatten_with_path(ours)
    assert len(flat_r) == len(flat_o)
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_r, flat_o):
        assert jtu.keystr(path_r) == jtu.keystr(path_o)
        np.testing.assert_allclose(
            np.asarray(leaf_r), np.asarray(leaf_o), rtol=5e-3, atol=1e-5,
            err_msg=f"{label} {jtu.keystr(path_r)}",
        )

"""Update-level golden parity: one InforMARL update step on the SAME rollout
with the SAME (transferred) parameters must produce the same updated
parameters in both frameworks.

Protocol:
 1. Build reference InforMARL (under shims) and collect a rollout with it.
 2. Convert the rollout to our layout (graphs rebuilt from typed states via
    our env.get_graph — bitwise-equal features by env parity; final_graph
    replaces per-step next_graph).
 3. Remap the reference params into our fused layout; both sides get fresh
    Adam states and identical minibatch/chunk index arrays (bypassing the
    host-side shuffle).
 4. Run each framework's update_inner; remap the reference's UPDATED params
    and compare leaf-by-leaf with ours (also loss/grad metrics).

coef_ent=0 because the reference's entropy estimator seeds its sample with a
trace-time np.random.randint (reference distribution.py:40-43; PARITY.md
divergence #1) — with the entropy bonus disabled the losses and gradients are
deterministic functions of the shared inputs.
"""
import os
import sys

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
import numpy as np
import pytest

REF_PATH = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="reference repo not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

B, T, N_AGENTS, N_OBS = 4, 8, 3, 2


@pytest.fixture(scope="module")
def setup():
    from ref_oracle.shims import import_reference

    import_reference(REF_PATH)
    from dgppo.algo import make_algo as ref_make_algo
    from dgppo.env import make_env as ref_make_env

    from dgppo_fov_tpu.algo import make_algo as our_make_algo
    from dgppo_fov_tpu.env import make_env as our_make_env

    akw = dict(
        n_agents=N_AGENTS,
        cost_weight=0.0,
        batch_size=2 * T,  # 2 envs per minibatch
        rnn_step=4,
        seed=0,
        use_rnn=True,
        coef_ent=0.0,
        train_steps=100,
    )
    env_r = ref_make_env("MPETarget", num_agents=N_AGENTS, num_obs=N_OBS, max_step=T)
    env_o = our_make_env("MPETarget", num_agents=N_AGENTS, num_obs=N_OBS, max_step=T)
    algo_r = ref_make_algo(
        algo="informarl", env=env_r, node_dim=env_r.node_dim, edge_dim=env_r.edge_dim,
        state_dim=env_r.state_dim, action_dim=env_r.action_dim, **akw,
    )
    algo_o = our_make_algo(
        algo="informarl", env=env_o, node_dim=env_o.node_dim, edge_dim=env_o.edge_dim,
        state_dim=env_o.state_dim, action_dim=env_o.action_dim, **akw,
    )
    return env_r, env_o, algo_r, algo_o


def _convert_rollout(env_o, ro_r):
    """Reference Rollout -> our Rollout (same floats, our graph layout)."""
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

    return OurRollout(
        graph=bT_graph,
        actions=ro_r.actions,
        rnn_states=ro_r.rnn_states,
        rewards=ro_r.rewards,
        costs=ro_r.costs,
        dones=ro_r.dones,
        log_pis=ro_r.log_pis,
        final_graph=b_final,
    )


def test_update_inner_parity(setup):
    from dgppo_fov_tpu.utils.ref_remap import remap_policy_params, remap_value_params

    env_r, env_o, algo_r, algo_o = setup

    # 1. Reference rollout.
    ro_r = algo_r.collect(algo_r.params, jr.split(jr.PRNGKey(7), B))

    # 2. Convert to our layout (strip env_states as both updates do).
    ro_o = _convert_rollout(env_o, ro_r)
    ro_o = ro_o._replace(
        graph=ro_o.graph.without_env_states(), final_graph=ro_o.final_graph.without_env_states()
    )
    assert ro_o.rnn_states.shape == ro_r.rnn_states.shape

    # 3. Transfer params into our train states; align PRNG keys so the
    #    (unused at coef_ent=0) entropy keys match too.
    # Deep-copy: both update_inners donate their train-state buffers, and the
    # remap shares unfused leaves with the reference param tree.
    copy = lambda tree: jtu.tree_map(lambda x: jnp.array(x), tree)
    algo_o.policy_train_state = algo_o.policy_train_state.replace(
        params=copy(remap_policy_params(algo_r.params["policy"]))
    )
    algo_o.Vl_train_state = algo_o.Vl_train_state.replace(
        params=copy(remap_value_params(algo_r.params["Vl"]))
    )
    algo_o.key = algo_r.key

    batch_idx = jnp.array([[0, 1], [2, 3]])
    rnn_chunk_ids = jnp.arange(T).reshape(T // 4, 4)
    step = jnp.array(0)

    # 4. Run both update_inners.
    Vl_r, pol_r, info_r = algo_r.update_inner(
        algo_r.Vl_train_state, algo_r.policy_train_state, ro_r, batch_idx, rnn_chunk_ids, step
    )
    Vl_o, pol_o, info_o = algo_o.update_inner(
        algo_o.Vl_train_state, algo_o.policy_train_state, ro_o, batch_idx, step
    )

    # Metrics parity (entropy excluded: reference uses a trace-time seed).
    for k in ("Vl/loss", "Vl/grad_norm", "policy/loss", "policy/grad_norm", "policy/clip_frac",
              "policy/total_variation_dist", "Vl/max_target", "Vl/min_target", "policy/log_pi_min"):
        np.testing.assert_allclose(
            float(info_r[k]), float(info_o[k]), rtol=2e-3, atol=2e-4, err_msg=k
        )

    # Updated-parameter parity: remap the reference's post-update params and
    # compare leaf-by-leaf with ours.
    pol_r_mapped = remap_policy_params(pol_r.params)
    flat_r, _ = jtu.tree_flatten_with_path(pol_r_mapped)
    flat_o, _ = jtu.tree_flatten_with_path(pol_o.params)
    assert len(flat_r) == len(flat_o)
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_r, flat_o):
        assert jtu.keystr(path_r) == jtu.keystr(path_o)
        np.testing.assert_allclose(
            np.asarray(leaf_r), np.asarray(leaf_o), rtol=5e-3, atol=1e-5,
            err_msg=f"policy {jtu.keystr(path_r)}",
        )

    Vl_r_mapped = remap_value_params(Vl_r.params)
    for (path_r, leaf_r), (path_o, leaf_o) in zip(
        jtu.tree_flatten_with_path(Vl_r_mapped)[0], jtu.tree_flatten_with_path(Vl_o.params)[0]
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_r), np.asarray(leaf_o), rtol=5e-3, atol=1e-5,
            err_msg=f"Vl {jtu.keystr(path_r)}",
        )

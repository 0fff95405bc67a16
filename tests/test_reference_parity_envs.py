"""All-environment golden parity sweep against the ACTUAL reference code
(running under scripts/ref_oracle/shims.py).

For every registered environment: same reset key => bitwise-equal typed
states; same action sequence => matching rewards / costs / dones / agent &
goal states, over MULTIPLE seeds and 16+ steps (both step functions run
jitted, so deep horizons are cheap). Where both sides share an env_states
NamedTuple layout (MPE `.obs`, the full VMAS state tuples), those leaves are
compared too. VMAS additionally runs a scripted contact-rich trajectory
(sustained pushing), and a sensitivity meta-test proves the sweep catches an
injected 1e-3 dynamics perturbation in every family.

This exercises, against the reference itself: every env's PRNG consumption
order, dynamics integrator, LiDAR raycasting, margin/clip cost conventions,
VMAS contact physics (reference physax runs on the jax_dataclasses shim),
and graph state layout.
"""
import os
import sys

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

REF_PATH = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="reference repo not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

# (env_id, n_agents, num_obs or None, trajectory rtol, seeds, n_steps)
ENV_CASES = [
    ("MPETarget", 3, 2, 1e-6, (0, 1, 2), 16),
    ("MPESpread", 3, 2, 1e-6, (0, 1, 2), 16),
    ("MPELine", 3, 2, 1e-6, (0, 1, 2), 16),
    ("MPEFormation", 3, 2, 1e-6, (0, 1, 2), 16),
    ("MPECorridor", 3, None, 1e-6, (0, 1, 2), 16),
    ("MPEConnectSpread", 3, 2, 1e-6, (0, 1, 2), 16),
    ("LidarTarget", 3, 2, 1e-5, (0, 1, 2), 16),
    ("LidarSpread", 3, 2, 1e-5, (0, 1, 2), 16),
    ("LidarLine", 3, 2, 1e-5, (0, 1, 2), 16),
    ("LidarBicycleTarget", 3, 2, 1e-5, (0, 1, 2), 16),
    ("LidarOmniTarget", 3, 2, 1e-5, (0, 1, 2), 16),
    ("VMASReverseTransport", 3, None, 1e-4, (0, 1, 2), 16),
    ("VMASWheel", 3, None, 1e-4, (0, 1, 2), 16),
    # 5-agent variants, one per family's benchmark shapes (VMAS envs are
    # 3-agent-only — both implementations assert identically on that).
    ("MPESpread", 5, 2, 1e-6, (0, 1), 16),
    ("MPELine", 5, 2, 1e-6, (0, 1), 16),
    ("LidarSpread", 5, 2, 1e-5, (0, 1), 16),
    ("LidarBicycleTarget", 5, 2, 1e-5, (0, 1), 16),
]


@pytest.fixture(scope="module")
def ref():
    from ref_oracle.shims import import_reference

    return import_reference(REF_PATH)


def _make_pair(ref, env_id, n_agents, num_obs):
    from dgppo.env import make_env as ref_make_env

    from dgppo_fov_tpu.env import make_env as our_make_env

    kw = {} if num_obs is None else {"num_obs": num_obs}
    return (
        ref_make_env(env_id, num_agents=n_agents, max_step=16, **kw),
        our_make_env(env_id, num_agents=n_agents, max_step=16, **kw),
    )


def _random_actions(n_steps, n_agents, action_dim, seed):
    keys = jr.split(jr.PRNGKey(1000 + seed), n_steps)
    return [jr.uniform(k, (n_agents, action_dim), minval=-1.0, maxval=1.0) for k in keys]


def _push_actions(n_steps, n_agents, action_dim):
    """Scripted contact-rich schedule: sustained diagonal push, then reverse.

    Drives VMAS agents into the hollow-box wall (ReverseTransport) /
    the line (Wheel) hard enough to keep contact forces active for many
    consecutive steps — the regime 4 random steps never reached."""
    push = jnp.ones((n_agents, action_dim)) / np.sqrt(2.0)
    return [push if t < n_steps // 2 else -push for t in range(n_steps)]


def _env_state_leaves(g_r, g_o):
    """Comparable leaf pairs of env_states when both sides share a NamedTuple
    layout (every registered family does). Fields whose nested structures
    diverge in leaf count (e.g. redesigned obstacle pytrees) are skipped —
    their content is covered via typed states and costs instead."""
    import jax.tree_util as jtu

    er, eo = g_r.env_states, g_o.env_states
    if er is None or eo is None:
        return []
    fr, fo = getattr(er, "_fields", None), getattr(eo, "_fields", None)
    if not fr or fr != fo:
        return []
    out = []
    for name in fr:
        lr, lo = jtu.tree_leaves(getattr(er, name)), jtu.tree_leaves(getattr(eo, name))
        if len(lr) == len(lo) and all(
            np.shape(a) == np.shape(b) for a, b in zip(lr, lo)
        ):
            out += [(f"{name}[{i}]", a, b) for i, (a, b) in enumerate(zip(lr, lo))]
    return out


def _lockstep_compare(env_r, env_o, n_agents, rtol, actions, err, perturb=0.0, steps=None):
    """Run both envs through `actions` with jitted steps, asserting parity of
    rewards/costs/dones/agent/goal states (+ shared env_states leaves) at
    every step. With `perturb`, our agent states are nudged by that amount
    after every step (an injected dynamics error) and the function asserts
    nothing. Returns (max divergence seen under perturb, final our-side
    graph). `steps` takes a pre-jitted (step_r, step_o) pair so callers
    looping over seeds compile each env pair once, not once per seed."""
    has_goals = any(t.type_id == 1 for t in env_o.graph_spec.types)
    n_goal = env_o.graph_spec.type_count(1) if has_goals else 0
    step_r, step_o = steps if steps is not None else (jax.jit(env_r.step), jax.jit(env_o.step))

    key = jr.PRNGKey(err["seed"])
    g_r, g_o = env_r.reset(key), env_o.reset(key)
    if not perturb:
        np.testing.assert_array_equal(
            np.asarray(g_r.type_states(type_idx=0, n_type=n_agents)),
            np.asarray(g_o.type_states(0)),
            err_msg=f"{err} reset agents",
        )
        if has_goals:
            np.testing.assert_array_equal(
                np.asarray(g_r.type_states(type_idx=1, n_type=n_goal)),
                np.asarray(g_o.type_states(1)),
                err_msg=f"{err} reset goals",
            )
        for name, lr, lo in _env_state_leaves(g_r, g_o):
            np.testing.assert_array_equal(
                np.asarray(lr), np.asarray(lo), err_msg=f"{err} reset env_states.{name}"
            )

    worst = 0.0
    for t, action in enumerate(actions):
        g_r, rew_r, cost_r, done_r, _ = step_r(g_r, action)
        g_o, rew_o, cost_o, done_o, _ = step_o(g_o, action)
        if perturb:
            # Measure the divergence the sweep's observables would see at
            # this step (rewards, costs, agent states as produced by the
            # dynamics) BEFORE injecting this step's error.
            pairs = [
                (rew_r, rew_o),
                (cost_r, cost_o),
                (g_r.type_states(type_idx=0, n_type=n_agents), g_o.type_states(0)),
            ] + [(lr, lo) for _, lr, lo in _env_state_leaves(g_r, g_o)]
            for val_r, val_o in pairs:
                if np.asarray(val_r).size:  # VMAS typed states are empty
                    worst = max(worst, float(np.max(np.abs(np.asarray(val_r) - np.asarray(val_o)))))
            # Inject the error where the family's dynamics actually read
            # agent positions: VMAS integrates env_states.a_pos; MPE/Lidar
            # step from the graph's typed agent states. Only agent 0 is
            # perturbed — a uniform translation would be invisible to
            # relative-distance costs.
            es = g_o.env_states
            if hasattr(es, "a_pos"):
                g_o = g_o.replace(
                    env_states=es._replace(a_pos=es.a_pos.at[0].add(perturb))
                )
            else:
                g_o = g_o.replace(states=g_o.states.at[0, :2].add(perturb))
            continue
        ctx = dict(err, t=t)
        np.testing.assert_allclose(
            np.asarray(rew_r), np.asarray(rew_o), rtol=rtol, atol=rtol, err_msg=f"{ctx} reward"
        )
        np.testing.assert_allclose(
            np.asarray(cost_r), np.asarray(cost_o), rtol=rtol, atol=rtol, err_msg=f"{ctx} cost"
        )
        assert bool(np.asarray(done_r)) == bool(np.asarray(done_o)), f"{ctx} done"
        np.testing.assert_allclose(
            np.asarray(g_r.type_states(type_idx=0, n_type=n_agents)),
            np.asarray(g_o.type_states(0)),
            rtol=rtol, atol=rtol, err_msg=f"{ctx} agent states",
        )
        if has_goals:
            np.testing.assert_allclose(
                np.asarray(g_r.type_states(type_idx=1, n_type=n_goal)),
                np.asarray(g_o.type_states(1)),
                rtol=rtol, atol=rtol, err_msg=f"{ctx} goal states",
            )
        for name, lr, lo in _env_state_leaves(g_r, g_o):
            np.testing.assert_allclose(
                np.asarray(lr), np.asarray(lo), rtol=rtol, atol=rtol,
                err_msg=f"{ctx} env_states.{name}",
            )
    return worst, g_o


@pytest.mark.parametrize("env_id,n_agents,num_obs,rtol,seeds,n_steps", ENV_CASES)
def test_env_parity(ref, env_id, n_agents, num_obs, rtol, seeds, n_steps):
    env_r, env_o = _make_pair(ref, env_id, n_agents, num_obs)
    assert env_r.action_dim == env_o.action_dim
    assert env_r.n_cost == env_o.n_cost
    steps = (jax.jit(env_r.step), jax.jit(env_o.step))  # compile once across seeds
    for seed in seeds:
        actions = _random_actions(n_steps, n_agents, env_o.action_dim, seed)
        _lockstep_compare(
            env_r, env_o, n_agents, rtol, actions,
            {"env": env_id, "n": n_agents, "seed": seed}, steps=steps,
        )


@pytest.mark.parametrize("env_id", ["VMASReverseTransport", "VMASWheel"])
def test_vmas_contact_parity(ref, env_id):
    """Contact-rich VMAS parity: 24 steps of sustained scripted pushing keeps
    the contact solver (sphere-box penetration, friction/drag, torque on the
    line) active — and asserts the trajectory actually entered the contact
    regime (nonzero payload motion) so the schedule can't silently go stale."""
    env_r, env_o = _make_pair(ref, env_id, 3, None)
    steps = (jax.jit(env_r.step), jax.jit(env_o.step))
    actions = _push_actions(24, 3, env_o.action_dim)
    for seed in (0, 1, 2):
        key = jr.PRNGKey(seed)
        g0 = env_o.reset(key)
        _, g_o = _lockstep_compare(
            env_r, env_o, 3, 1e-4, actions, {"env": env_id, "n": 3, "seed": seed}, steps=steps
        )
        # Payload state must have moved: contact happened.
        if env_id == "VMASReverseTransport":
            moved = float(np.max(np.abs(np.asarray(g_o.env_states.box_pos - g0.env_states.box_pos))))
        else:
            moved = float(np.max(np.abs(np.asarray(g_o.env_states.line_angle - g0.env_states.line_angle))))
        assert moved > 1e-3, f"{env_id} seed={seed}: push schedule produced no contact"


@pytest.mark.parametrize(
    "env_id,num_obs,rtol",
    [("MPESpread", 2, 1e-6), ("LidarTarget", 2, 1e-5), ("VMASWheel", None, 1e-4)],
)
def test_sweep_catches_dynamics_perturbation(ref, env_id, num_obs, rtol):
    """Sensitivity guard for the sweep itself: a 1e-3 per-step dynamics error
    injected into OUR agent states must blow past each family's tolerance in
    the observables the sweep compares (rewards/costs) within 16 steps. If
    this fails, the sweep has gone blind and parity passes mean nothing."""
    env_r, env_o = _make_pair(ref, env_id, 3, num_obs)
    actions = _random_actions(16, 3, env_o.action_dim, seed=0)
    worst, _ = _lockstep_compare(
        env_r, env_o, 3, rtol, actions, {"env": env_id, "n": 3, "seed": 0}, perturb=1e-3
    )
    assert worst > 10 * rtol, (
        f"{env_id}: injected 1e-3 dynamics error only moved rewards/costs by "
        f"{worst:.2e} — sweep would not detect it"
    )


def test_omni_phantom_origin_cost_parity(ref):
    """Regression for the reference's padded-count quirk in LidarOmniTarget's
    obstacle cost: its get_cost gathers top_k*N + 1 type-2 states (node
    count minus agents/goals, i.e. INCLUDING the padding node), and the
    zeros-buffer scatter leaves a phantom point at the origin in the
    min-distance. Drive both envs with many random-action steps (enough to
    enter the regime where every real hit is farther than the origin) and
    require cost parity throughout."""
    env_r, env_o = _make_pair(ref, "LidarOmniTarget", 3, 2)
    step_r, step_o = jax.jit(env_r.step), jax.jit(env_o.step)
    worst = 0.0
    for seed in (0, 1, 2):
        key = jr.PRNGKey(seed)
        g_r = env_r.reset(key)
        g_o = env_o.reset(key)
        np.testing.assert_allclose(
            np.asarray(env_r.get_cost(g_r)), np.asarray(env_o.get_cost(g_o)), rtol=0, atol=1e-5
        )
        akey = jr.PRNGKey(100 + seed)
        for _ in range(16):
            akey, k = jr.split(akey)
            action = jr.uniform(k, (3, env_o.action_dim), minval=-1.0, maxval=1.0)
            g_r, _, c_r, _, _ = step_r(g_r, action)
            g_o, _, c_o, _, _ = step_o(g_o, action)
            diff = float(np.max(np.abs(np.asarray(c_r) - np.asarray(c_o))))
            worst = max(worst, diff)
            np.testing.assert_allclose(
                np.asarray(c_r), np.asarray(c_o), rtol=0, atol=1e-5
            )
    assert worst < 1e-5

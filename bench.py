#!/usr/bin/env python
"""Benchmark: DGPPO env-steps/s/chip on batched rollout collection.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
BASELINE.json targets: >=50x CPU env-steps/s on one chip at 2048 envs.

Engineered to survive the axon platform's erratic remote-compile latency
(measured 40-330 s for the same program; round-1 bench timed out at 9m+):

 - persistent compilation cache at .jax_cache/ for CPU-backend runs (created
   fresh + HOST_KEY-stamped on first use; round 3's committed pre-warmed set
   was removed in round 4 — measurement showed axon TPU programs are compiled
   server-side and never read or write the local cache, and CPU entries are
   only trustworthy on the machine that wrote them. Repopulate with ONE
   command: `BENCH_PLATFORM=cpu python bench.py`);
 - phase-stamped heartbeats on stderr every few seconds, so a timeout tail
   shows exactly where the run was;
 - SIGTERM/SIGINT/SIGALRM handler that emits the JSON line with whatever
   has completed (timed iters > post-compile estimate > nothing);
 - a self-deadline (BENCH_DEADLINE, default 480 s) that fires before typical
   external 10-minute timeouts;
 - the UPDATE phase runs FIRST, on a shape-identical all-zeros rollout built
   with jax.eval_shape (update timing is shape-dependent only — no
   data-dependent control flow under jit), so the headline ppo_updates_per_s
   number typically exists ~2 min in. NOTE: DGPPO.update internally compiles
   its own deterministic 128-step rollout, so ONE rollout-class program
   still sits before the update metric (two sat before it in the old
   rollout-first order); the remote compile of such programs was measured
   anywhere from 66 s to >480 s for the SAME program depending on axon
   server load (2026-08-19), so the exposure is halved, not eliminated.
   Both phase lines are held and printed together with the
   ppo_updates_per_s line LAST, so a driver that records the final JSON
   line gets the update metric whenever ANY phase completed;
 - algo construction happens on the HOST CPU backend with one batched
   device_put to the chip (utils/hostinit.py). Eager init on the axon
   backend was the r4 bench killer: 217.8 s wall / ~8 s CPU of tiny init
   programs round-tripping the tunnel before any real compile started;
 - an INSURANCE child process (BENCH_SMALL=0 disables) runs the same update
   bench at 256 envs x T=32 concurrently over its own tunnel session and
   its JSON lines are merged into this process's output. Even if the
   headline compile outlives the deadline on a loaded server (r4: zero
   output at rc=75), a measured small-shape ppo_updates_per_s line lands.

Env vars:
  BENCH_ENV       environment id        (default MPETarget)
  BENCH_N_ENV     parallel envs         (default 2048)
  BENCH_MAX_STEP  horizon               (default 128)
  BENCH_N_AGENTS  agents                (default 3)
  BENCH_MODE      both | rollout | update   (default both; see above)
  BENCH_ITERS     timed iterations      (default 3; update iters = min(2, this))
  BENCH_DEADLINE  seconds before partial-result emission (default 480)
  BENCH_CACHE_DIR compilation cache dir (default <repo>/.jax_cache)
  BENCH_CPU_BASELINE  steps/s reference (default: measured on this image)
  BENCH_CPU_UPDATE_BASELINE  updates/s reference (default: measured on this
                  image — same code, one CPU device, same 2048x128 shapes)
  BENCH_UPDATE_INPUT  zeros | collect  (default zeros; collect reproduces
                  the round-2 behavior of timing the update on a really
                  collected rollout — timing-identical, much more compile)
  BENCH_DTYPE     compute dtype: bf16 | f32 (default bf16 — validated
                  end-to-end at 20k training steps, see PARITY.md
                  "Revalidation 1"; ~1.6x faster updates than f32. The
                  vs_baseline denominator stays the f32 CPU baseline — the
                  reference's own training precision — so the ratio reads
                  "our best validated mode vs the reference's mode".
                  Set BENCH_DTYPE=f32 for the bit-parity configuration.)
  BENCH_STACKED   1|0: stacked Vl+policy update (default 0 — measured
                  1.03x the separate pair, see algo/stacked.py; A/B knob)
  BENCH_SMALL     1|0: insurance child at 256env x T=32 (default 1 in
                  'both' mode); BENCH_CPU_UPDATE_SMALL_BASELINE overrides
                  its CPU-reference denominator
  BENCH_LIDAR_ENV / BENCH_VMAS_ENV  extra breadth rows timed in 'both' mode
                  with leftover deadline budget (defaults LidarSpread and
                  VMASWheel at its native T=64; "0" disables a row)
  BENCH_LIDAR_MIN_BUDGET  min leftover seconds to attempt an extra row
                  (default 100)
"""
import json
import os
import signal
import sys
import threading
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

_T0 = time.time()
_REPO = os.path.dirname(os.path.abspath(__file__))

import jax

# BENCH_PLATFORM=cpu forces the CPU backend (for measuring CPU baselines;
# env vars alone don't stick on this image — sitecustomize prepends an
# experimental TPU platform).
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

# Persistent compilation cache (CPU-backend runs only — axon TPU programs
# compile server-side and never touch this dir, measured 2026-08-17). The
# dir is created and HOST_KEY-stamped on first CPU use; a populated dir from
# a different CPU/jax (or unstamped, e.g. round 3's committed set) is
# refused and a throwaway dir used instead.
_CACHE_DIR = os.environ.get("BENCH_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))


def _cache_host_ok(cache_dir: str) -> bool:
    """HOST_KEY guard (mirrors tests/conftest.py): cached CPU executables
    embed the compile machine's features, so a cache populated on a different
    CPU microarch must not be loaded when benching with BENCH_PLATFORM=cpu.
    TPU entries are host-independent (compiled server-side), so the guard
    only applies to CPU-backend runs."""
    if os.environ.get("BENCH_PLATFORM") != "cpu":
        return True
    marker = os.path.join(cache_dir, "HOST_KEY")
    try:
        recorded = open(marker).read().strip()
    except OSError:
        # Unstamped NON-empty dir: fail CLOSED. jax's own cache keying does
        # NOT cover the CPU microarch, and loading an AOT entry compiled for
        # different CPU features risks SIGILL (observed as cpu_aot_loader
        # errors when round 3's unstamped cache was read on a new host).
        if not os.path.isdir(cache_dir) or not os.listdir(cache_dir):
            return True  # empty/new dir: nothing stale to load; stamped below
        return False
    return recorded == _host_key()


def _host_key() -> str:
    import hashlib

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(f"{flags}|jax={jax.__version__}".encode()).hexdigest()[:16]


if not _cache_host_ok(_CACHE_DIR):
    import tempfile

    print(
        f"[bench] {_CACHE_DIR} was populated on a different CPU/jax (HOST_KEY "
        "mismatch or unstamped) — using a throwaway cache dir for this CPU run.",
        file=sys.stderr,
    )
    _CACHE_DIR = tempfile.mkdtemp(prefix="bench_jax_cache_")
if os.environ.get("BENCH_PLATFORM") == "cpu":
    # Stamp fresh/empty CPU cache dirs so future runs can trust them (never
    # stamp a pre-existing populated dir — mirrors tests/conftest.py).
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        if not [e for e in os.listdir(_CACHE_DIR) if e != "HOST_KEY"] and not os.path.exists(
            os.path.join(_CACHE_DIR, "HOST_KEY")
        ):
            with open(os.path.join(_CACHE_DIR, "HOST_KEY"), "w") as f:
                f.write(_host_key())
    except OSError:
        pass
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.random as jr

# ---------------------------------------------------------------- telemetry

_PHASE = "startup"
_LOCK = threading.Lock()
_INFLIGHT = {}  # slot name -> staging dict for a phase currently measuring
_DONE = []  # finalized phase results, emitted together at the end
_EMITTED = False
_HEADLINE = None  # metric name that must be the LAST emitted line


def _hb(msg: str) -> None:
    print(f"[bench {time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _set_phase(p: str) -> None:
    global _PHASE
    _PHASE = p
    _hb(p)


def _heartbeat_loop(period: float = 15.0) -> None:
    while not _EMITTED:
        time.sleep(period)
        if not _EMITTED:
            _hb(f"heartbeat: phase={_PHASE} cpu={time.process_time():.0f}s")


def _ordered_lines(partial: bool):
    """All completed lines plus any in-flight staging (tagged :partial),
    sorted so ppo_updates_per_s lines come last and the headline metric is
    the FINAL line (it is the metric the driver must capture when it records
    only the last JSON line)."""
    with _LOCK:
        lines = list(_DONE)
        if partial:
            lines += [
                dict(r, metric=r["metric"] + ":partial")
                for r in _INFLIGHT.values()
                if "value" in r
            ]
    return sorted(
        lines,
        key=lambda r: (
            r["metric"].startswith("ppo_updates_per_s"),
            r["metric"].split(":partial")[0] == _HEADLINE,
        ),
    )


def _emit(partial: bool = False) -> None:
    """Print every measured line, one JSON object per line (safe from a
    signal handler), headline update metric last. Every line carries dtype/
    platform/n_env keys so archived BENCH_r*.json artifacts are
    self-describing (r4 advisor finding)."""
    global _EMITTED
    if _EMITTED:
        return
    lines = _ordered_lines(partial)
    if not lines:
        if partial:
            _hb(f"killed during phase={_PHASE} with no measurable result")
        return
    _EMITTED = True
    if partial:
        _hb(f"emitting {len(lines)} line(s) from phase={_PHASE} (deadline/signal)")
    keys = ("metric", "value", "unit", "vs_baseline", "dtype", "platform", "n_env")
    for out in lines:
        print(json.dumps({k: out[k] for k in keys if k in out}), flush=True)


def _finalize_phase(slot: str = "main") -> None:
    """Move a slot's staged result into the finalized set."""
    with _LOCK:
        r = _INFLIGHT.pop(slot, None)
        if r and "value" in r:
            _DONE.append(r)


_SMALL_PROC = None  # insurance-phase child; killed on any exit path


def _on_signal(signum, frame):
    _emit(partial=True)
    if _SMALL_PROC is not None and _SMALL_PROC.poll() is None:
        _SMALL_PROC.kill()  # never leave an orphan TPU client behind
    # Re-raise default behavior so the process actually dies on TERM/INT.
    signal.signal(signum, signal.SIG_DFL)
    if signum != signal.SIGALRM:
        os.kill(os.getpid(), signum)
    else:
        # Self-deadline: exit 0 only if a (partial) result actually went out;
        # an empty run must NOT look like success to the driver.
        sys.exit(0 if _EMITTED else 75)


def _record(metric: str, value: float, unit: str, vs_baseline: float, *, n_env: int,
            slot: str = "main") -> None:
    with _LOCK:
        _INFLIGHT.setdefault(slot, {}).update(
            metric=metric,
            value=round(value, 4),
            unit=unit,
            vs_baseline=round(vs_baseline, 4),
            dtype=os.environ.get("BENCH_DTYPE", "bf16") or "f32",
            platform=jax.devices()[0].platform,
            n_env=n_env,
        )


# ---------------------------------------------------------------- workload


def build(env_id: str, n_env: int, max_step: int, n_agents: int):
    from dgppo_fov_tpu.algo import make_algo
    from dgppo_fov_tpu.env import make_env
    from dgppo_fov_tpu.utils.hostinit import build_on_host

    t0 = time.perf_counter()
    env = make_env(env_id, num_agents=n_agents, max_step=max_step)
    t1 = time.perf_counter()

    def construct():
        return make_algo(
            algo="dgppo",
            env=env,
            node_dim=env.node_dim,
            edge_dim=env.edge_dim,
            state_dim=env.state_dim,
            action_dim=env.action_dim,
            n_agents=env.num_agents,
            batch_size=n_env * max_step // 2,
            rnn_step=16,
            seed=0,
            train_steps=100,
            # Default bf16: the validated TPU mode (PARITY.md "Revalidation
            # 1" — 20k-step MPETarget run, 0 non-finite updates, safe_rate
            # 100%). BENCH_DTYPE=f32 is the reference-bit-parity config.
            compute_dtype=os.environ.get("BENCH_DTYPE", "bf16") or None,
            stacked_update=os.environ.get("BENCH_STACKED", "0") != "0",
        )

    # Host-side init + ONE batched transfer: eager construction on the axon
    # backend was the r4 bench killer — 217.8 s wall / ~8 s CPU of tiny
    # init programs each doing a tunnel round-trip (BENCH_r04 tail,
    # VERDICT r4 missing #1a). See utils/hostinit.py.
    algo = build_on_host(construct)
    t2 = time.perf_counter()
    _hb(f"build[{env_id}]: make_env {t1 - t0:.1f}s, make_algo(host)+transfer {t2 - t1:.1f}s")
    return env, algo


def cpu_baseline_for(env_id: str, n_agents: int) -> float:
    # Per-(env, n_agents) CPU baselines measured on this image (single CPU
    # device, same jitted vmapped rollout, 2048 envs x 128 steps; VMAS x64).
    # The >=50x target compares TPU vs CPU on the SAME workload (BASELINE.md).
    CPU_BASELINES = {
        ("MPETarget", 3): 16254.0,
        ("MPESpread", 3): 16359.5,
        ("MPESpread", 5): 5138.7,
        ("MPELine", 3): 9625.3,
        ("MPELine", 5): 9414.4,
        ("LidarSpread", 3): 7989.3,
        ("LidarTarget", 3): 8830.3,
        ("LidarLine", 3): 10129.1,
        ("LidarBicycleTarget", 5): 4458.8,
        ("LidarOmniTarget", 3): 7139.8,
        ("VMASReverseTransport", 3): 39748.1,
        ("VMASWheel", 3): 48240.9,
    }
    if (env_id, n_agents) in CPU_BASELINES:
        default = CPU_BASELINES[(env_id, n_agents)]
    else:
        fallback = next(((e, n, v) for (e, n), v in CPU_BASELINES.items() if e == env_id), None)
        if fallback is None:
            default = 16254.0
            _hb(f"no CPU baseline for {env_id}; using MPETarget n=3 (approximate)")
        else:
            default = fallback[2]
            _hb(
                f"no CPU baseline for {env_id} n={n_agents}; falling back to n={fallback[1]} "
                f"(vs_baseline is approximate — set BENCH_CPU_BASELINE to override)"
            )
    return float(os.environ.get("BENCH_CPU_BASELINE", default))


def run_rollout(env, algo, env_id: str, n_env: int, n_agents: int, iters: int,
                slot: str = "main") -> None:
    steps_per_iter = n_env * env.max_episode_steps
    n_chips = max(1, len(jax.devices()))
    baseline = cpu_baseline_for(env_id, n_agents)
    metric = f"env_steps_per_s_per_chip@{env_id}:{n_env}env"

    _set_phase("collect: compile+first run")
    keys = jr.split(jr.PRNGKey(0), n_env)
    t = time.perf_counter()
    rollout = algo.collect(algo.params, keys)
    jax.block_until_ready(rollout.rewards)
    dt0 = time.perf_counter() - t
    # Provisional number in case we are killed before any timed iter: the
    # compile-inclusive rate is a LOWER bound on throughput.
    per_chip0 = steps_per_iter / dt0 / n_chips
    _record(metric, per_chip0, "steps/s/chip", per_chip0 / baseline, n_env=n_env, slot=slot)
    _set_phase(f"collect: compiled+ran in {dt0:.1f}s ({per_chip0:.0f} steps/s/chip incl. compile)")

    times = []
    burst = 1
    for i in range(iters):
        _set_phase(f"collect: timed iter {i + 1}/{iters} (burst {burst})")
        keys = [jr.split(jr.PRNGKey(i * burst + j + 1), n_env) for j in range(burst)]
        t = time.perf_counter()
        for k in keys:
            rollout = algo.collect(algo.params, k)
        jax.block_until_ready(rollout.rewards)
        times.append((time.perf_counter() - t) / burst)
        per_chip = steps_per_iter / (sum(times) / len(times)) / n_chips
        _record(metric, per_chip, "steps/s/chip", per_chip / baseline, n_env=n_env, slot=slot)
        _hb(f"iter {i + 1}: {times[-1]:.3f}s/collect -> running mean {per_chip:.0f} steps/s/chip")
        if i == 0 and times[0] < 0.15:
            # Sub-150 ms programs are dispatch-latency-bound through the
            # remote tunnel (VMASWheel T=64: ~55 ms compute but 38-60 ms
            # of per-call round-trip, which swung the row 48-72x across
            # days). Burst several async dispatches per timed iter so the
            # device pipeline, not the tunnel, sets the rate.
            burst = max(1, int(round(0.5 / max(times[0], 1e-3))))
    return rollout


def zeros_rollout(algo, n_env: int):
    """A shape/dtype-identical all-zeros rollout via jax.eval_shape — no
    collect compile. Update timing is shape-dependent only (static control
    flow under jit), so timing on zeros equals timing on collected data;
    validated against the collected-input numbers in COVERAGE.md."""
    import jax.numpy as jnp
    import jax.tree_util as jtu

    keys = jr.split(jr.PRNGKey(0), n_env)
    shapes = jax.eval_shape(algo.collect, algo.params, keys)
    return jtu.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


# Measured on this image 2026-08-19 (one CPU device, same code/shapes as the
# TPU update: DGPPO @ MPETarget n=3, 2048 envs x T=128, 2 minibatches; timed
# iters 417.9 s and 390.3 s after a 537.6 s compile+first run).
CPU_UPDATE_BASELINE = 0.00247  # updates/s (~405 s per update)

# Insurance-phase shape (guaranteed-cheap first metric, VERDICT r4 weak #1):
# small enough to compile+run fast, same program structure as the headline.
SMALL_N_ENV, SMALL_MAX_STEP = 256, 32
# Measured on this image 2026-08-20 (one CPU device, DGPPO @ MPETarget n=3,
# 256 envs x T=32, batch 4096 -> 2 minibatches, f32; timed iters 5.97-6.09 s).
CPU_UPDATE_SMALL_BASELINE = 0.166  # updates/s (~6.0 s per update)


def _spawn_small_update(env_id: str, n_agents: int, deadline_left: float):
    """Run the small-shape update bench in a SEPARATE process (its own
    tunnel session, so its remote compile is not queued behind this
    process's headline compile) and stream its JSON lines into _DONE as
    they arrive. Returns the Popen handle (or None).

    This is the guaranteed-cheap first metric: even if the headline
    2048-env compile outlives the deadline (r4: build stall + cold bf16
    compile = zero output), the driver still records a measured
    ppo_updates_per_s line at the small shape."""
    import subprocess

    child_env = dict(
        os.environ,
        BENCH_MODE="update",
        BENCH_ENV=env_id,
        BENCH_N_AGENTS=str(n_agents),
        BENCH_N_ENV=str(SMALL_N_ENV),
        BENCH_MAX_STEP=str(SMALL_MAX_STEP),
        BENCH_ITERS="2",
        BENCH_SMALL="0",
        BENCH_DEADLINE=str(max(60, int(deadline_left - 30))),
        BENCH_CPU_UPDATE_BASELINE=os.environ.get(
            "BENCH_CPU_UPDATE_SMALL_BASELINE", str(CPU_UPDATE_SMALL_BASELINE)
        ),
    )
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=child_env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
    except OSError as e:
        _hb(f"small-update subprocess failed to start: {e}")
        return None

    def _reader():
        for line in proc.stdout:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in row and "value" in row:
                with _LOCK:
                    _DONE.append(row)
                _hb(f"small-update row landed: {row['metric']} = {row['value']}")
        proc.stdout.close()

    threading.Thread(target=_reader, daemon=True).start()
    return proc


def run_update(env, algo, env_id: str, n_env: int, iters: int, rollout=None,
               slot: str = "main", baseline: float = None) -> None:
    import numpy as np

    np.random.seed(0)
    metric = f"ppo_updates_per_s@{env_id}:{n_env}env"
    if baseline is None:
        baseline = float(os.environ.get("BENCH_CPU_UPDATE_BASELINE", CPU_UPDATE_BASELINE))

    if rollout is None:
        if os.environ.get("BENCH_UPDATE_INPUT", "zeros") == "collect":
            _set_phase("update: collect compile+run")
            keys = jr.split(jr.PRNGKey(0), n_env)
            rollout = algo.collect(algo.params, keys)
            jax.block_until_ready(rollout.rewards)
        else:
            _set_phase("update: build zeros rollout (eval_shape)")
            rollout = zeros_rollout(algo, n_env)
    _set_phase(f"update[{slot}]: compile+first update")
    t = time.perf_counter()
    info = algo.update(rollout, step=0)
    jax.block_until_ready(info["policy/loss"])
    dt0 = time.perf_counter() - t
    _record(metric, 1.0 / dt0, "updates/s", (1.0 / dt0) / baseline, n_env=n_env, slot=slot)
    _set_phase(f"update[{slot}]: compiled+ran in {dt0:.1f}s")

    times = []
    for i in range(iters):
        _set_phase(f"update[{slot}]: timed iter {i + 1}/{iters}")
        t = time.perf_counter()
        info = algo.update(rollout, step=i + 1)
        jax.block_until_ready(info["policy/loss"])
        times.append(time.perf_counter() - t)
        ups = 1.0 / (sum(times) / len(times))
        _record(metric, ups, "updates/s", ups / baseline, n_env=n_env, slot=slot)
        _hb(f"iter {i + 1}: {times[-1]:.2f}s -> running mean {ups:.3f} updates/s")


def main():
    global _HEADLINE
    env_id = os.environ.get("BENCH_ENV", "MPETarget")
    n_env = int(os.environ.get("BENCH_N_ENV", 2048))
    max_step = int(os.environ.get("BENCH_MAX_STEP", 128))
    n_agents = int(os.environ.get("BENCH_N_AGENTS", 3))
    mode = os.environ.get("BENCH_MODE", "both")
    iters = int(os.environ.get("BENCH_ITERS", 3))
    deadline = float(os.environ.get("BENCH_DEADLINE", 480))
    _HEADLINE = f"ppo_updates_per_s@{env_id}:{n_env}env"

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, _on_signal)
    signal.alarm(int(deadline))
    threading.Thread(target=_heartbeat_loop, daemon=True).start()

    _hb(
        f"config: env={env_id} n_env={n_env} T={max_step} n_agents={n_agents} "
        f"mode={mode} iters={iters} deadline={deadline:.0f}s cache={_CACHE_DIR} "
        f"devices={jax.devices()}"
    )
    global _SMALL_PROC
    small_proc = None
    if mode == "both" and os.environ.get("BENCH_SMALL", "1") != "0":
        small_proc = _spawn_small_update(env_id, n_agents, deadline - (time.time() - _T0))
        _SMALL_PROC = small_proc
    _set_phase("build env+algo")
    env, algo = build(env_id, n_env, max_step, n_agents)

    if mode == "update":
        run_update(env, algo, env_id, n_env, iters)
        _finalize_phase()
    elif mode == "rollout":
        run_rollout(env, algo, env_id, n_env, n_agents, iters)
        _finalize_phase()
    else:
        # both: the update phase runs FIRST (its zeros input skips the
        # collect compile, so the headline metric exists early); the lines
        # print together at the end with ppo_updates_per_s LAST.
        run_update(env, algo, env_id, n_env, min(2, iters))
        _finalize_phase()
        run_rollout(env, algo, env_id, n_env, n_agents, iters)
        _finalize_phase()
        # Near-floor breadth rows (VERDICT r3 #3): with remaining deadline
        # budget, time additional family rollouts (LidarSpread is the README
        # row closest to the 50x floor; VMASWheel covers the contact-physics
        # family, at its own T=64 horizon like the README/CPU-baseline rows)
        # as extra held lines. Partial emission (signal handler) still
        # protects the two primary metrics if a phase outlives the deadline.
        lidar_env_id = os.environ.get("BENCH_LIDAR_ENV", "LidarSpread")
        vmas_env_id = os.environ.get("BENCH_VMAS_ENV", "VMASWheel")
        extra_min_budget = float(os.environ.get("BENCH_LIDAR_MIN_BUDGET", 100))
        extra_rows = [(lidar_env_id, "lidar", max_step), (vmas_env_id, "vmas", 64)]
        for row_env_id, family, row_max_step in extra_rows:
            budget_left = deadline - (time.time() - _T0)
            if row_env_id == "0":
                continue
            if budget_left <= extra_min_budget:
                _hb(f"skipping {family} row: only {budget_left:.0f}s of deadline left")
                continue
            _set_phase(f"{family} row: build {row_env_id} ({budget_left:.0f}s budget left)")
            renv, ralgo = build(row_env_id, n_env, row_max_step, n_agents)
            # Timed iters are ~0.1-0.25 s here, but per-call dispatch jitter
            # through the tunnel is +-25%: the r5 validation run's VMASWheel
            # mean over 2 iters landed at 49.2x — under the 50x floor the
            # row exists to demonstrate — while r3's 3-iter mean was 71x.
            # More iters are effectively free; average over at least 5.
            run_rollout(renv, ralgo, row_env_id, n_env, n_agents, max(5, iters))
            _finalize_phase()

    if small_proc is not None and small_proc.poll() is None:
        # Big phases done with budget to spare; give the insurance child its
        # own remaining slice, then ask it to emit what it has (SIGTERM ->
        # its handler prints partial lines, the reader thread collects them).
        budget_left = deadline - (time.time() - _T0)
        _set_phase(f"waiting on small-update child ({budget_left:.0f}s budget left)")
        try:
            small_proc.wait(timeout=max(1, budget_left - 15))
        except Exception:
            small_proc.terminate()
            try:
                small_proc.wait(timeout=10)
            except Exception:
                small_proc.kill()
    time.sleep(0.5)  # let the reader thread drain the child's final lines

    signal.alarm(0)
    _emit()


if __name__ == "__main__":
    main()

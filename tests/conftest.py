"""Force tests onto a virtual 8-device CPU mesh (standard JAX trick for
testing sharding/mesh code without a real TPU slice — SURVEY.md §4).

Note: this image's sitecustomize registers an 'axon' TPU platform and
prepends it to jax_platforms, so env vars alone don't stick — we must
override the config after importing jax (before any backend is initialized).
"""
import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

# The suite is XLA-CPU-COMPILE-bound on this 1-core image (~64 min at full
# backend optimization). Dialing the backend optimization level down speeds
# the measured compile-heavy tests ~35-50% with every golden/bitwise parity
# test still green — both frameworks run under the same process, so the
# compiler settings apply to reference and ours identically. Runtime-speed
# loss is irrelevant here (tests are compile-dominated). Must be set before
# the first jax backend touch; subprocess tests inherit it via os.environ.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"
).strip()

import jax  # noqa: E402

# Persistent compile cache for the suite: CPU executables cache across
# processes/runs, unlike axon TPU programs. The committed tests/.jax_cache
# (populated by a full suite run on this image) is used automatically when
# present; override the location with TEST_JAX_CACHE_DIR=<dir>, or disable
# with TEST_JAX_CACHE_DIR=0 (do that when running on a DIFFERENT CPU
# microarchitecture — cached executables embed machine features).
# Exported through os.environ (jax reads these natively) so the subprocess
# tests (CLI trains, two-process jax.distributed) share the same cache.
def _host_key() -> str:
    """Fingerprint of what makes a cached CPU executable loadable here:
    the CPU feature flags plus the jax version."""
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


_default_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
if not os.environ.get("TEST_JAX_CACHE_DIR") and os.path.isdir(_default_cache):
    _marker = os.path.join(_default_cache, "HOST_KEY")
    try:
        _recorded = open(_marker).read().strip()
    except OSError:
        _recorded = None
    if _recorded is None or _recorded == _host_key():
        os.environ["TEST_JAX_CACHE_DIR"] = _default_cache
        # Do NOT write a missing HOST_KEY marker here: the committed cache
        # dir is part of the working tree, and merely running the tests must
        # not dirty it (ADVICE r3). A marker is written only when jax itself
        # populates a FRESH cache dir (see _write_host_key_if_new below).
    else:
        import sys as _sys

        print(
            "[conftest] tests/.jax_cache was populated on a different CPU/jax "
            "(HOST_KEY mismatch) — persistent compile cache DISABLED; compiles "
            "will be cold. Set TEST_JAX_CACHE_DIR=<dir> to use a local cache.",
            file=_sys.stderr,
        )
def _write_host_key_if_new(cache_dir: str) -> None:
    """Stamp HOST_KEY only into a fresh/empty cache dir — never as a side
    effect of running the suite against an existing (e.g. committed) cache."""
    try:
        os.makedirs(cache_dir, exist_ok=True)
        entries = [e for e in os.listdir(cache_dir) if e != "HOST_KEY"]
        marker = os.path.join(cache_dir, "HOST_KEY")
        if not entries and not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write(_host_key())
    except OSError:
        pass


if os.environ.get("TEST_JAX_CACHE_DIR", "0") != "0":
    _write_host_key_if_new(os.environ["TEST_JAX_CACHE_DIR"])
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.environ["TEST_JAX_CACHE_DIR"]
    os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    jax.config.update("jax_compilation_cache_dir", os.environ["TEST_JAX_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_oracle():
    """The actual reference (/root/reference/dgppo) imported in-process under
    the ref_oracle shims — one import for the whole session."""
    import os as _os
    import sys as _sys

    if not _os.path.isdir("/root/repo/../reference") and not _os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "scripts"))
    from ref_oracle.shims import import_reference

    return import_reference("/root/reference")


@pytest.fixture(scope="session")
def parity_rollouts(ref_oracle):
    """Session-shared inputs for the update-parity tests: ONE reference
    stochastic rollout (PRNGKey(7)) and ONE deterministic rollout
    (PRNGKey(11)) on the tiny MPETarget workload, plus their conversions to
    our layout. Valid for every algorithm class because they share the
    policy-init key stream (see tests/parity_common.py); collecting them once
    saves ~4 redundant reference-collect compiles across the suite."""
    import types

    import jax.random as jr

    from .parity_common import B, convert_rollout, build_pair

    env_r, env_o, algo_r, algo_o = build_pair("informarl")
    ro_r = algo_r.collect(algo_r.params, jr.split(jr.PRNGKey(7), B))

    # Deterministic rollout with the same (shared-stream) policy params —
    # what DGPPO's det_rollout_fn would collect at PRNGKey(11).
    import functools as ft

    import jax as _jax

    from dgppo.trainer.utils import test_rollout as ref_test_rollout

    def det_single(cur_key):
        return ref_test_rollout(
            algo_r._env, ft.partial(algo_r.act, params=algo_r.params), algo_r.init_rnn_state, cur_key
        )

    det_r = _jax.jit(_jax.vmap(det_single))(jr.split(jr.PRNGKey(11), B))

    return types.SimpleNamespace(
        ro_r=ro_r,
        ro_o=convert_rollout(env_o, ro_r),
        det_r=det_r,
        det_o=convert_rollout(env_o, det_r),
    )


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite (~100 tests, hundreds of XLA CPU compiles in one process)
    reliably segfaults inside XLA's backend_compile around test #91 on this
    image; any tail subset passes in isolation, i.e. it is compile-resource
    accumulation in XLA's CPU JIT, not a specific program. Clearing the
    executable caches between modules keeps the process under the threshold
    (costs a few recompiles of programs shared across modules).
    """
    yield
    jax.clear_caches()

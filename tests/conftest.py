"""Force tests onto a virtual 8-device CPU mesh (standard JAX trick for
testing sharding/mesh code without a real TPU slice — SURVEY.md §4).

Note: this image's sitecustomize registers an 'axon' TPU platform and
prepends it to jax_platforms, so env vars alone don't stick — we must
override the config after importing jax (before any backend is initialized).
"""
import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


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

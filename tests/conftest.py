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

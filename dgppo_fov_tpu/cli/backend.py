"""Shared CLI backend selection.

One place for the sitecustomize workaround both entry points need: this
image prepends an experimental TPU platform to jax_platforms, so
JAX_PLATFORMS/JAX_DISABLE_JIT env vars don't stick — the config must be set
programmatically BEFORE the first backend touch (any jax.devices() call).
"""
import os


def apply_backend_overrides(jax, cpu: bool = False, debug: bool = False) -> None:
    """Apply platform/device-count/debug overrides; call before backend init.

    - DGPPO_JAX_PLATFORM / DGPPO_NUM_CPU_DEVICES env vars: headless override
      used by the CLI-level subprocess tests.
    - cpu=True (the --cpu flag): force the CPU backend.
    - debug=True (the --debug flag): disable jit for breakpoint debugging
      (reference train.py:29-31 sets JAX_DISABLE_JIT; too late on this image).
    """
    if os.environ.get("DGPPO_JAX_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DGPPO_JAX_PLATFORM"])
    if os.environ.get("DGPPO_NUM_CPU_DEVICES"):
        jax.config.update("jax_num_cpu_devices", int(os.environ["DGPPO_NUM_CPU_DEVICES"]))
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if debug:
        jax.config.update("jax_disable_jit", True)

"""Force tests onto a virtual 8-device CPU mesh (standard JAX trick for
testing sharding/mesh code without a real TPU slice — SURVEY.md §4)."""
import os

# Force CPU (the session may pre-set JAX_PLATFORMS to a TPU backend).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

"""dgppo_fov_tpu: TPU-native multi-agent safe-RL framework.

A from-scratch JAX/XLA/Pallas re-engineering with the capabilities of the
DGPPO-FoV reference (dense block graphs, masked-dense graph transformers,
mesh-sharded rollouts and updates).
"""
__version__ = "0.1.0"

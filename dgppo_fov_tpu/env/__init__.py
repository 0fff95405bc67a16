"""Environment registry and factory.

Behavioral parity reference: /root/reference/dgppo/env/__init__.py:10-55.
Unlike the reference `make_env` (which mutates the shared class-level PARAMS
dict — a footgun noted in SURVEY.md §5), we copy params per instance.
Environments are imported lazily so importing the package never pulls in
matplotlib et al.
"""
import importlib
from typing import Optional

from .base import MultiAgentEnv

DEFAULT_MAX_STEP = 128

# env_id -> (module path, class name)
ENV = {
    "MPETarget": ("dgppo_fov_tpu.env.mpe.mpe_target", "MPETarget"),
    "MPESpread": ("dgppo_fov_tpu.env.mpe.mpe_spread", "MPESpread"),
    "MPELine": ("dgppo_fov_tpu.env.mpe.mpe_line", "MPELine"),
    "MPEFormation": ("dgppo_fov_tpu.env.mpe.mpe_formation", "MPEFormation"),
    "MPECorridor": ("dgppo_fov_tpu.env.mpe.mpe_corridor", "MPECorridor"),
    "MPEConnectSpread": ("dgppo_fov_tpu.env.mpe.mpe_connect_spread", "MPEConnectSpread"),
    "LidarSpread": ("dgppo_fov_tpu.env.lidar.lidar_spread", "LidarSpread"),
    "LidarTarget": ("dgppo_fov_tpu.env.lidar.lidar_target", "LidarTarget"),
    "LidarLine": ("dgppo_fov_tpu.env.lidar.lidar_line", "LidarLine"),
    "LidarBicycleTarget": ("dgppo_fov_tpu.env.lidar.lidar_bicycle_target", "LidarBicycleTarget"),
    "LidarOmniTarget": ("dgppo_fov_tpu.env.lidar.lidar_omni_target", "LidarOmniTarget"),
    "VMASReverseTransport": ("dgppo_fov_tpu.env.vmas.vmas_reverse_transport", "VMASReverseTransport"),
    "VMASWheel": ("dgppo_fov_tpu.env.vmas.vmas_wheel", "VMASWheel"),
}


def env_class(env_id: str):
    assert env_id in ENV, f"Environment {env_id} not implemented."
    module, cls_name = ENV[env_id]
    return getattr(importlib.import_module(module), cls_name)


def make_env(
    env_id: str,
    num_agents: int,
    max_step: Optional[int] = None,
    full_observation: bool = False,
    num_obs: Optional[int] = None,
    n_rays: Optional[int] = None,
) -> MultiAgentEnv:
    cls = env_class(env_id)
    params = dict(cls.PARAMS)
    max_step = DEFAULT_MAX_STEP if max_step is None else max_step
    if num_obs is not None:
        params["n_obs"] = num_obs
    if n_rays is not None:
        params["n_rays"] = n_rays
    if full_observation:
        params["comm_radius"] = params["default_area_size"] * 10
    return cls(num_agents=num_agents, area_size=None, max_step=max_step, dt=0.03, params=params)

"""Metrics logging: JSONL on disk, wandb-compatible when wandb is installed.

The reference logs through wandb only (trainer/trainer.py:53-54,125,138, with
an offline fallback via a DNS probe, trainer/utils.py:133-149). This image has
no wandb and no egress, so the primary sink is a `metrics.jsonl` file with the
exact reference metric names (the parity dashboard, SURVEY.md §5); wandb is
used opportunistically when importable and enabled.
"""
import json
import os
import time
from typing import Optional


def _try_wandb():
    try:
        import wandb  # noqa: F401

        return wandb
    except Exception:
        return None


class MetricsLogger:
    def __init__(
        self,
        log_dir: Optional[str],
        run_name: str = "run",
        project: str = "dgppo",
        group: Optional[str] = None,
        use_wandb: bool = True,
        save_log: bool = True,
    ):
        self.log_dir = log_dir
        self.save_log = save_log and log_dir is not None
        self._file = None
        if self.save_log:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._wandb = _try_wandb() if use_wandb else None
        if self._wandb is not None:
            try:
                if os.environ.get("WANDB_MODE", "") != "disabled":
                    os.environ.setdefault("WANDB_MODE", "offline")
                self._wandb.init(name=run_name, project=project, group=group, dir=log_dir or ".")
            except Exception:
                self._wandb = None
        self._t0 = time.time()

    def log(self, metrics: dict, step: int):
        import math

        # Batch any device arrays into one transfer before the per-value
        # float() loop (each float(device_array) is a blocking round-trip on
        # the remote-TPU image). No-op for plain floats/numpy scalars.
        try:
            import jax

            metrics = jax.device_get(metrics)
        except Exception:
            pass

        clean = {}
        for k, v in metrics.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self._file is not None:
            # Non-finite floats serialize as null: json.dumps would emit the
            # non-standard NaN/Infinity literals, which strict JSON parsers
            # (jq, pandas, JSON.parse) reject — one transient NaN loss would
            # poison the whole parity dashboard file.
            rec = {"step": step, "time": time.time() - self._t0}
            rec.update({k: (v if math.isfinite(v) else None) for k, v in clean.items()})
            self._file.write(json.dumps(rec, allow_nan=False) + "\n")
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def config(self, cfg: dict):
        if self._wandb is not None:
            try:
                self._wandb.config.update(cfg, allow_val_change=True)
            except Exception:
                pass

    def close(self):
        if self._file is not None:
            self._file.close()

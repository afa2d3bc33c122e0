"""Metrics logging and profiling hooks.

The reference logs per-step {loss, step, lr} to wandb from rank 0
(``/root/reference/train.py:113-117,253-260``) and offers no profiling
(SURVEY.md section 5.1). Here: an optional-wandb metrics logger that degrades
to JSONL on disk, and first-class ``jax.profiler`` trace capture around
training steps.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

__all__ = ["MetricsLogger", "profile_trace"]


class MetricsLogger:
    """Log scalar metrics to wandb when available/enabled, else JSONL."""

    def __init__(
        self,
        run_dir: str,
        project: Optional[str] = None,
        run_name: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        use_wandb: bool = False,
        is_lead_host: bool = True,
    ):
        self.is_lead_host = is_lead_host
        self._wandb = None
        self._file = None
        if not is_lead_host:
            return
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, name=run_name, config=config)
            except Exception:
                self._wandb = None
        os.makedirs(run_dir, exist_ok=True)
        self._file = open(os.path.join(run_dir, "metrics.jsonl"), "a")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if not self.is_lead_host:
            return
        record = {k: float(v) for k, v in metrics.items()}
        if step is not None:
            record["step"] = step
        record["time"] = time.time()
        if self._wandb is not None:
            self._wandb.log(record, step=step)
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._file is not None:
            self._file.close()
            self._file = None


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str], enabled: bool = True):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    if not enabled or log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

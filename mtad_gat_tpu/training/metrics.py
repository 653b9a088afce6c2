"""Metrics logging: JSONL always, TensorBoard optionally.

Replaces the reference's TensorBoard-only logging (training.py:79-81,250-253)
with an always-on machine-readable JSONL stream plus the same TB scalars when
available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = False,
                 args_summary: str = "", enabled: bool = True):
        # ``enabled=False`` turns every method into a no-op — how non-primary
        # processes on a pod are silenced (multihost write hygiene: exactly
        # one process writes each run-directory file).
        self.enabled = enabled
        self.log_dir = log_dir
        if enabled:
            os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        if use_tensorboard and enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
                if args_summary:
                    self._tb.add_text("args_summary", args_summary)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def text(self, tag: str, value: str) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, value)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()

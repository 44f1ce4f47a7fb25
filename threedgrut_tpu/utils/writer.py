"""Experiment tracking: TensorBoard (and optional W&B) writer factory.

Reference: threedgrut/utils/misc.py:139-162 (create_summary_writer) and the
trainer's scalar/image logging (trainer.py:475-601). Falls back to a JSONL
metrics file when tensorboard is unavailable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricsWriter:
    """TensorBoard SummaryWriter wrapper with JSONL fallback."""

    def __init__(self, out_dir: str, experiment_name: str,
                 use_wandb: bool = False):
        self.dir = os.path.join(out_dir, experiment_name)
        os.makedirs(self.dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=self.dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=experiment_name,
                                         dir=self.dir, sync_tensorboard=True)
            except Exception:
                pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        v = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, v, step)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "step": step, tag: v}) + "\n")

    def scalars(self, values: dict, step: int, prefix: str = "") -> None:
        for k, v in values.items():
            try:
                self.scalar(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: [H, W, 3] float in [0, 1]."""
        if self._tb is not None:
            self._tb.add_image(tag, np.clip(img, 0, 1).transpose(2, 0, 1),
                               step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """Jet colormap for hit-count/depth debug images
    (reference misc.py:126-136)."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)

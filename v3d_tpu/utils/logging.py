"""Experiment logging (counterpart of the reference's wandb/TensorBoard/CSV
logger stack: video_diffusion.py:276-291, launch.py:102-109,
train_from_vid.py:226-316).

Always-on CSV + console; TensorBoard and wandb attach when their packages
are importable."""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional


class ExperimentLogger:
    def __init__(self, log_dir: str, project: str = "v3d_tpu",
                 use_wandb: bool = False, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._csv_path = os.path.join(log_dir, "metrics.csv")
        self._csv_keys = None
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, dir=log_dir)
            except ImportError:
                print("wandb unavailable; CSV/TB logging only")

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        step = step if step is not None else int(time.time())
        row = {"step": step, **{k: v for k, v in metrics.items()
                                if isinstance(v, (int, float))}}
        write_header = self._csv_keys is None
        if write_header:
            self._csv_keys = list(row)
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_keys,
                               extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)
        if self._tb is not None:
            for k, v in row.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(row, step=step)

    def log_images(self, name: str, images, step: int) -> None:
        """Recon-grid logging (video_diffusion.py:276-291 analog)."""
        from v3d_tpu.data.video_io import save_image_grid

        path = os.path.join(self.log_dir, f"{name}_{step:08d}.png")
        save_image_grid(path, images)

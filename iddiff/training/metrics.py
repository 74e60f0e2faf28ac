"""Metrics/observability: JSONL + optional TensorBoard, python logging to file.

Replaces the reference's TensorBoardLogger + self.log + log_records.txt
(/root/reference/run_lib.py:51, lightning_callbacks/callbacks.py:42).  The
primary artifact is metrics.jsonl (machine-readable, append-only);
TensorBoard scalars/images are written when tensorboardX is importable.
"""
from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path


class MetricsWriter:
    def __init__(self, workdir: str, enabled: bool = True):
        # enabled=False on non-zero hosts: multi-host training writes
        # metrics/TB/log files from process 0 only (checkpoints are saved
        # collectively by orbax and are unaffected)
        self.enabled = enabled
        self._jsonl = None
        self._tb = None
        Path(workdir).mkdir(parents=True, exist_ok=True)
        if enabled:
            self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except Exception:
                pass
            logging.basicConfig(
                filename=os.path.join(workdir, "log_records.txt"),
                level=logging.INFO,
                format="%(asctime)s %(levelname)s %(message)s",
            )
        self.log = logging.getLogger("iddiff")

    def scalars(self, step: int, **kv):
        if not self.enabled:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in kv.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in kv.items():
                self._tb.add_scalar(k, float(v), int(step))

    def image(self, step: int, tag: str, img):
        """img: (H, W, C) float in [0,1]."""
        if self._tb is not None:
            self._tb.add_image(tag, img, int(step), dataformats="HWC")

    def figure(self, step: int, tag: str, fig):
        if self._tb is not None:
            self._tb.add_figure(tag, fig, int(step))

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

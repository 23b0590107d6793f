"""Run-dir Logger (reference: ``utils.py:15-74``).

Keeps the reference's observable surface: ``logs/<subdir>/<run-name>/<rand>``
layout, plaintext ``log.txt`` with timestamps, tensorboard scalars under the
same tag names (``gan/train/{G_loss,D_loss,D_penalty,D_real,D_gen}``,
``gan/test/fid[/best]``), FID CSV, and the config copied into the logdir.
"""

from __future__ import annotations

import csv
import json
import os
import sys
from datetime import datetime
from typing import Optional

import numpy as np


class Logger:
    def __init__(self, fn: Optional[str], subdir: Optional[str] = None,
                 resume: Optional[str] = None, root: str = "logs",
                 rand: Optional[int] = None, mute: bool = False):
        """``mute=True`` resolves the logdir but writes nothing — multihost
        non-zero ranks use it so only process 0 logs (reference rank gating:
        ``train_gan.py:184-225``) while every rank still knows the shared
        logdir for collective checkpoint writes."""
        if resume:
            logdir = resume
            if not os.path.isdir(logdir):
                raise OSError(f"logdir does not exist: {logdir}")
        else:
            if subdir is None:
                subdir = datetime.today().strftime("%y%m%d")
            if rand is None:
                rand = np.random.randint(10000)
            logdir = os.path.join(root, subdir, fn or "run", str(rand))
            os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self.mute = mute
        self._writer = None
        self.log_file = (None if mute
                         else open(os.path.join(logdir, "log.txt"), "a"))

    @property
    def writer(self):
        if self._writer is None:
            if self.mute:
                self._writer = False
                return self._writer
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(self.logdir)
            except Exception as e:  # tensorboard optional; scalars go to JSONL
                # Surface the degradation ONCE per run — a misconfigured TB
                # should be visible, not silent (scalars still land in
                # scalars.jsonl either way).
                self._writer = False
                msg = (f"tensorboardX unavailable ({type(e).__name__}: {e}); "
                       f"scalars will be written to scalars.jsonl only")
                print(f"[logger] {msg}", file=sys.stderr)
                if self.log_file is not None:
                    self.log_file.write(f"[logger] {msg}\n")
                    self.log_file.flush()
        return self._writer

    def log(self, string):
        if self.mute:
            return
        line = f"[{datetime.now()}] {string}"
        self.log_file.write(line + "\n")
        self.log_file.flush()
        print(line)
        sys.stdout.flush()

    def log_dirname(self, string):
        if self.mute:
            return
        line = f"{string} ({self.logdir})"
        self.log_file.write(line + "\n")
        self.log_file.flush()
        print(line)
        sys.stdout.flush()

    def scalar_summary(self, tag: str, value, step: int):
        if self.mute:
            return
        value = float(value)
        if self.writer:
            self.writer.add_scalar(tag, value, step)
        with open(os.path.join(self.logdir, "scalars.jsonl"), "a") as f:
            f.write(json.dumps({"tag": tag, "value": value, "step": int(step)}) + "\n")

    def image_summary(self, tag: str, image, step: int):
        if self.mute:
            return
        if self.writer:
            self.writer.add_image(tag, image, step, dataformats="HWC")

    def close(self):
        if self._writer:
            self._writer.close()
        if self.log_file is not None:
            self.log_file.close()


def append_csv(path: str, header, row):
    """FID CSV (reference evaluate/gan.py:147-159 schema)."""
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(header)
        w.writerow(row)

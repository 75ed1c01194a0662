"""Experiment management, logging, metrics writers, profiling.

Capability counterparts of utils/exp.py (auto-numbered experiment dirs,
resume-by-prefix), utils/log.py (logger + period-averaged scalar writer), and
analysis/profiler.py (torch.profiler → ``jax.profiler`` traces).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from pathlib import Path
from typing import Dict, Optional


def init_experiment(
    base_dir: str, exp_name: str = "exp", resume_prefix: Optional[str] = None
) -> Path:
    """Create (or resume) an auto-numbered experiment directory tree
    (ref utils/exp.py:16-187): <base>/<NNN>-<name>/{checkpoints,logs,vis}."""
    base = Path(base_dir)
    base.mkdir(parents=True, exist_ok=True)
    if resume_prefix is not None:
        matches = sorted(
            d for d in base.iterdir() if d.is_dir() and d.name.startswith(resume_prefix)
        )
        if not matches:
            raise FileNotFoundError(f"no experiment starting with {resume_prefix!r}")
        exp_dir = matches[-1]
    else:
        nums = [
            int(d.name.split("-")[0])
            for d in base.iterdir()
            if d.is_dir() and d.name.split("-")[0].isdigit()
        ]
        exp_dir = base / f"{(max(nums) + 1 if nums else 0):03d}-{exp_name}"
    for sub in ("checkpoints", "logs", "vis"):
        (exp_dir / sub).mkdir(parents=True, exist_ok=True)
    return exp_dir


def setup_logger(log_dir: Optional[str] = None, rank: int = 0) -> logging.Logger:
    """Console + per-run file logging, rank-gated like the reference
    (train_sm.py:617-624)."""
    logger = logging.getLogger("samq")
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    if logger.handlers:
        return logger
    fmt = logging.Formatter("(%(asctime)s) [%(levelname)s] %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir and rank == 0:
        fh = logging.FileHandler(
            os.path.join(log_dir, time.strftime("%Y-%m-%d_%H-%M-%S.log"))
        )
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class TqdmToLogger:
    """File-like adapter routing tqdm output into a logger
    (ref utils/log.py:19-42)."""

    def __init__(self, logger: logging.Logger, level=logging.INFO, mininterval=5.0):
        self.logger = logger
        self.level = level
        self.mininterval = mininterval
        self._last = 0.0
        self._buf = ""

    def write(self, buf):
        self._buf = buf.strip("\r\n\t ")

    def flush(self):
        now = time.time()
        if self._buf and now - self._last >= self.mininterval:
            self.logger.log(self.level, self._buf)
            self._last = now


class ScalarWriterAvg:
    """Period-averaged scalar writer → JSONL (+TensorBoard if available).

    Counterpart of SummaryWriterAvg (utils/log.py:61-97) without a hard
    TensorBoard dependency: every scalar is averaged over ``dump_period``
    updates and appended to ``scalars.jsonl``.
    """

    def __init__(self, log_dir: str, dump_period: int = 10):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.dump_period = dump_period
        self._avg: Dict[str, list] = {}
        self._file = open(self.log_dir / "scalars.jsonl", "a")
        self._tb = None
        try:  # optional tensorboardX/flax metric writer
            from flax.metrics import tensorboard  # type: ignore

            self._tb = tensorboard.SummaryWriter(str(self.log_dir))
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, global_step: int, disable_avg=False):
        if disable_avg:
            self._write(tag, value, global_step)
            return
        buf = self._avg.setdefault(tag, [])
        buf.append(float(value))
        if len(buf) >= self.dump_period:
            self._write(tag, sum(buf) / len(buf), global_step)
            buf.clear()

    def _write(self, tag, value, step):
        self._file.write(json.dumps({"tag": tag, "value": value, "step": step}) + "\n")
        self._file.flush()
        if self._tb is not None:
            self._tb.scalar(tag, value, step)

    def close(self):
        self._file.close()


class Profiler:
    """jax.profiler wrapper with a schedule (wait/warmup/active), counterpart
    of analysis/profiler.py:59-124's torch.profiler usage."""

    def __init__(self, log_dir: str, wait: int = 2, warmup: int = 2, active: int = 6):
        self.log_dir = log_dir
        self.wait, self.warmup, self.active = wait, warmup, active
        self._step = 0
        self._tracing = False

    def step(self):
        import jax

        self._step += 1
        start = self.wait + self.warmup
        if self._step == start and not self._tracing:
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        elif self._tracing and self._step >= start + self.active:
            jax.profiler.stop_trace()
            self._tracing = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False

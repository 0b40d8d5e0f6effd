"""Logging utilities (reference: core/utils/log.py:14-147).

Provides the global logger, per-run file handlers, the window-averaged
TensorBoard writer, and optional wandb init (gated — wandb is not a
dependency of this framework).
"""

from __future__ import annotations

import io
import logging
import time
from datetime import datetime
from pathlib import Path

logger = logging.getLogger("isegprobe_tpu")
logger.setLevel(logging.INFO)
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(_h)


def add_logging(logs_path, prefix: str = "") -> None:
    """Per-run file handler (reference: log.py:21-32)."""
    logs_path = Path(logs_path)
    logs_path.mkdir(parents=True, exist_ok=True)
    log_name = prefix + datetime.strftime(datetime.today(),
                                          "%Y-%m-%d_%H-%M-%S") + ".log"
    fh = logging.FileHandler(logs_path / log_name)
    fh.setFormatter(logging.Formatter(
        "(%(levelname)s) %(asctime)s: %(message)s", datefmt="%d-%m-%y %H:%M:%S"
    ))
    logger.addHandler(fh)


class TqdmToLogger(io.StringIO):
    """Redirect tqdm output into the logger (reference: log.py:35-53)."""

    def __init__(self, logger_, level=logging.INFO, mininterval=5):
        super().__init__()
        self.logger = logger_
        self.level = level
        self.mininterval = mininterval
        self.last_time = 0
        self.buf = ""

    def write(self, buf):
        self.buf = buf.strip("\r\n\t ")

    def flush(self):
        if len(self.buf) > 0 and time.time() - self.last_time > self.mininterval:
            self.logger.log(self.level, self.buf)
            self.last_time = time.time()


class SummaryWriterAvg:
    """TensorBoard writer with window-averaged scalars
    (reference: log.py:56-101). Built on tensorboardX."""

    def __init__(self, log_dir, flush_secs: int = 10, dump_period: int = 20):
        from tensorboardX import SummaryWriter

        self._writer = SummaryWriter(log_dir=str(log_dir), flush_secs=flush_secs)
        self._dump_period = dump_period
        self._avg_scalars = {}

    def add_scalar(self, tag, value, global_step, disable_avg: bool = False):
        if disable_avg or isinstance(value, (tuple, list, dict)):
            self._writer.add_scalar(tag, value, global_step=global_step)
            return
        if tag not in self._avg_scalars:
            self._avg_scalars[tag] = _ScalarAccumulator(self._dump_period)
        avg_scalar = self._avg_scalars[tag]
        avg_scalar.add(value)
        if avg_scalar.is_full():
            self._writer.add_scalar(tag, avg_scalar.value,
                                    global_step=global_step)
            avg_scalar.reset()

    def add_image(self, tag, img, global_step):
        self._writer.add_image(tag, img, global_step=global_step)

    def close(self):
        self._writer.close()


class _ScalarAccumulator:
    def __init__(self, period: int):
        self.sum = 0.0
        self.cnt = 0
        self.period = period

    def add(self, value) -> None:
        self.sum += float(value)
        self.cnt += 1

    @property
    def value(self) -> float:
        return self.sum / self.cnt if self.cnt > 0 else 0.0

    def reset(self) -> None:
        self.cnt = 0
        self.sum = 0.0

    def is_full(self) -> bool:
        return self.cnt >= self.period


def init_wandb(cfg) -> None:
    """Optional W&B (reference: log.py:131-147); no-op if wandb is absent or
    disabled in the config."""
    wandb_cfg = getattr(cfg, "wandb", None)
    if not wandb_cfg or not wandb_cfg.get("log_wandb", False):
        return
    try:
        import wandb
    except ImportError:
        logger.warning("wandb requested but not installed; skipping")
        return
    wandb.tensorboard.patch(root_logdir=str(cfg.LOGS_PATH))
    wandb.init(
        project=wandb_cfg.get("project", "iSegProbe-Train"),
        name=wandb_cfg.get("name") or None,
        dir=wandb_cfg.get("dir") or None,
        sync_tensorboard=True,
    )

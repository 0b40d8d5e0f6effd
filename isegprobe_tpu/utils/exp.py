"""Experiment initialization (reference: core/utils/exp.py:18-139).

Builds the run-directory tree mirroring the model-script path
(models/... -> EXPS_PATH/...), auto-numbers runs as ``XXX_name``, copies the
model script into the run dir, and wires file logging. The reference's NCCL
process-group init (exp.py:33-36) has no equivalent — JAX initializes its
distributed runtime from the environment.
"""

from __future__ import annotations

import logging
import shutil
import sys
from datetime import datetime
from pathlib import Path
from typing import Optional

from isegprobe_tpu.utils.config import EDict, find_main_config, load_yaml

logger = logging.getLogger("isegprobe_tpu")


def load_module(script_path: str | Path):
    """Dynamic import of an experiment model script
    (reference: core/utils/misc.py:20-25)."""
    import importlib.util

    script_path = Path(script_path)
    spec = importlib.util.spec_from_file_location(script_path.stem, script_path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[script_path.stem] = module
    spec.loader.exec_module(module)
    return module


def _find_resume_exp(exp_parent_path: Path, exp_pattern: str) -> Path:
    candidates = sorted(exp_parent_path.glob(f"{exp_pattern}*"))
    if not candidates:
        raise FileNotFoundError(
            f"No experiments matching '{exp_pattern}' under {exp_parent_path}"
        )
    if len(candidates) > 1:
        logger.warning("Multiple resume candidates; using %s", candidates[-1])
    return candidates[-1]


def init_experiment(cfg: EDict, model_name: Optional[str] = None) -> EDict:
    model_path = Path(cfg.exp.model_path)
    ftree = model_path.parts
    if "models" in ftree:
        idx = len(ftree) - 1 - ftree[::-1].index("models")
        model_name = model_path.stem
        rel = Path(*ftree[idx + 1 : -1])
    else:
        model_name = model_name or model_path.stem
        rel = Path()

    # per-model yaml override next to the script (reference: exp.py:156-162)
    side_cfg_path = model_path.parent / (model_path.stem + ".yaml")
    if side_cfg_path.exists():
        for k, v in load_yaml(side_cfg_path).items():
            cfg.setdefault(k, v)

    # merge machine paths, honoring the SUBCONFIGS per-model hook
    # (reference: exp.py:182-193)
    main_cfg_path = find_main_config(model_path.parent) or find_main_config(".")
    if main_cfg_path is not None:
        main = load_yaml(main_cfg_path)
        sub = main.pop("SUBCONFIGS", None)
        if sub and model_path.stem in sub:
            main.update(sub[model_path.stem])
        for k, v in main.items():
            cfg.setdefault(k, v)
    cfg.EXPS_PATH = Path(cfg.get("EXPS_PATH", "./experiments"))

    exp_parent_path = cfg.EXPS_PATH / rel / model_name
    exp_parent_path.mkdir(parents=True, exist_ok=True)

    resume_exp = cfg.training.get("resume_exp")
    if isinstance(resume_exp, bool):
        # `resume_exp=false` means "do not resume", not run 000 (bool is a
        # subclass of int, so it would otherwise format to "000" below)
        resume_exp = None
    if resume_exp is not None and resume_exp != "":
        # CLI overrides YAML-parse numeric run prefixes ("000" -> int 0,
        # which is falsy); normalize back to the zero-padded dir prefix so
        # `training.resume_exp=000` resumes run 000 instead of silently
        # starting a fresh run with fresh weights
        if isinstance(resume_exp, int):
            resume_exp = f"{resume_exp:03d}"
        exp_path = _find_resume_exp(exp_parent_path, resume_exp)
        # resolve the checkpoint to resume from (reference: trainer.py:550-570)
        prefix = cfg.training.get("resume_prefix", "latest")
        if isinstance(prefix, int) and not isinstance(prefix, bool):
            # `resume_prefix=008` YAML-parses to int 8; checkpoints are
            # saved zero-padded (trainer.py: f"{epoch:03d}.ckpt")
            prefix = f"{prefix:03d}"
        pattern = "last_checkpoint*" if prefix == "latest" else f"{prefix}*"
        candidates = sorted((exp_path / "checkpoints").glob(pattern + ".ckpt"))
        if candidates:
            cfg.training.weights = str(candidates[-1])
            logger.info("Resuming from %s", candidates[-1])
    else:
        last_run = max(
            (int(p.name.split("_")[0]) for p in exp_parent_path.iterdir()
             if p.is_dir() and p.name.split("_")[0].isdigit()),
            default=-1,
        )
        name = cfg.exp.get("name") or datetime.now().strftime("%Y-%m-%d")
        run_num = last_run + 1
        import jax

        multiproc = jax.process_count() > 1
        if multiproc:
            # all ranks must agree on the auto-numbered run dir even when a
            # shared filesystem makes the local `last_run` scan racy: rank 0
            # decides, everyone else follows (ref's DDP equivalent: only
            # rank 0 creates dirs, core/utils/exp.py:60-74)
            import numpy as np
            from jax.experimental import multihost_utils

            run_num = int(multihost_utils.broadcast_one_to_all(
                np.int32(run_num)))
        exp_path = exp_parent_path / f"{run_num:03d}_{name}"
        exp_path.mkdir(parents=True, exist_ok=multiproc)

    cfg.EXP_PATH = exp_path
    cfg.CHECKPOINTS_PATH = exp_path / "checkpoints"
    cfg.VIS_PATH = exp_path / "vis"
    cfg.LOGS_PATH = exp_path / "logs"
    for p in (cfg.CHECKPOINTS_PATH, cfg.VIS_PATH, cfg.LOGS_PATH):
        p.mkdir(exist_ok=True)

    if model_path.exists():
        shutil.copy(model_path, exp_path / model_path.name)

    handler = logging.FileHandler(cfg.LOGS_PATH / "train.log")
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname)s %(message)s"
    ))
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    logger.info("Experiment dir: %s", exp_path)
    return cfg

"""Training CLI (reference: train.py:13-27).

Usage:
    python train.py exp.model_path=models/sbd/dinov2/patch-embed_noup.py \
        [key=value overrides...]
"""

import sys

from isegprobe_tpu.utils.config import load_config
from isegprobe_tpu.utils.exp import init_experiment, load_module


def main() -> None:
    # multi-process gate BEFORE any device use (the analogue of the
    # reference's init_process_group at startup, core/utils/exp.py:33-36)
    from isegprobe_tpu.parallel.mesh import maybe_init_distributed
    from isegprobe_tpu.utils.misc import enable_compile_cache

    maybe_init_distributed()
    enable_compile_cache()

    overrides = [a for a in sys.argv[1:] if "=" in a]
    cfg = load_config("configs/train_cfg.yaml", overrides)

    model_script = load_module(cfg.exp.model_path)
    cfg = init_experiment(cfg)

    # snapshot the resolved config into the run dir
    import yaml

    def _plain(v):
        if isinstance(v, dict):
            return {k: _plain(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [_plain(x) for x in v]
        return v if isinstance(v, (int, float, bool, str, type(None))) else str(v)

    with open(cfg.EXP_PATH / "resolved_config.yaml", "w") as f:
        yaml.safe_dump(_plain(dict(cfg)), f)

    model_script.main(cfg)


if __name__ == "__main__":
    main()

"""Interactive demo CLI (reference: demo.py:17-75).

Usage:
    python demo.py checkpoint=/path/to/ckpt [eval_mode=fixed448]
"""

import sys


def main() -> None:
    overrides = [a for a in sys.argv[1:] if "=" in a]
    from isegprobe_tpu.utils.config import load_config

    eval_cfg = load_config("configs/eval_cfg.yaml", overrides)

    from evaluate import get_zoomin_params, load_model_for_eval
    from isegprobe_tpu.inference.predictor import TPUPredictor

    model, params = load_model_for_eval(eval_cfg.checkpoint, eval_cfg)
    zoomin_params = get_zoomin_params(eval_cfg, "demo")

    def predictor_factory():
        return TPUPredictor(
            model,
            params,
            target_size=zoomin_params["target_size"],
            skip_clicks=zoomin_params["skip_clicks"],
            with_flip=True,
            net_clicks_limit=eval_cfg.n_clicks,
        )

    from isegprobe_tpu.interactive_demo.app import run_app

    run_app(predictor_factory, prob_thresh=eval_cfg.thresh)


if __name__ == "__main__":
    main()

"""Interactive demo CLI (reference: demo.py:17-75).

Usage:
    python demo.py checkpoint=/path/to/ckpt [eval_mode=fixed448]

Left click adds a positive point, right click a negative one; mouse wheel
zooms, middle-drag (or Ctrl+drag) pans. The controls column exposes the same
options the reference GUI does (ZoomIn, BRS mode, thresholds, blending).
"""

import sys


def main() -> None:
    overrides = [a for a in sys.argv[1:] if "=" in a]
    from isegprobe_tpu.utils.config import load_config

    eval_cfg = load_config("configs/eval_cfg.yaml", overrides)

    from evaluate import get_zoomin_params, load_model_for_eval
    from isegprobe_tpu.inference.brs import get_predictor

    model, params = load_model_for_eval(eval_cfg.checkpoint, eval_cfg)
    default_zoomin = get_zoomin_params(eval_cfg, "demo")

    _UNSET = object()

    def predictor_builder(brs_mode="NoBRS", prob_thresh=0.5,
                          zoomin_params=_UNSET, predictor_params=None,
                          lbfgs_max_iters=20):
        # zoomin_params=None is the GUI's "Use ZoomIn" checkbox OFF (full
        # frame, no adaptive ROI) — only an *omitted* argument falls back to
        # the eval-config default
        return get_predictor(
            model,
            params,
            brs_mode=brs_mode,
            prob_thresh=prob_thresh,
            with_flip=True,
            zoom_in_params=(default_zoomin if zoomin_params is _UNSET
                            else zoomin_params),
            predictor_params=predictor_params,
            lbfgs_params={"maxfun": lbfgs_max_iters},
        )

    from isegprobe_tpu.interactive_demo.app import run_app

    run_app(predictor_builder, prob_thresh=eval_cfg.thresh)


if __name__ == "__main__":
    main()

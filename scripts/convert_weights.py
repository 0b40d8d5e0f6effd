"""Convert torch checkpoints (DINO/DINOv2/CLIP backbones, LiFT/LoftUp
upsamplers) into this framework's flax-msgpack format.

The reference downloads weights from torch.hub/timm/OpenAI at model-build time
(reference: core/model/featurizers/DINOv2.py:491, DINO.py:498-511,
maskclip/clip.py:118); here conversion is an explicit offline step so
inference never needs torch.

Usage:
    python scripts/convert_weights.py --kind dinov2 \
        --input dinov2_vits14_pretrain.pth --output dinov2_vits14.msgpack
    python scripts/convert_weights.py --kind lift --input lift_dinov2.pth \
        --output lift_dinov2.msgpack
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flax import serialization as flax_serialization  # noqa: E402


def load_torch_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return obj


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True,
                        choices=["dinov2", "dino", "clip", "lift", "loftup"])
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--depth", type=int, default=12)
    args = parser.parse_args()

    from isegprobe_tpu.models import convert

    sd = load_torch_state_dict(args.input)
    if args.kind == "dinov2":
        params = convert.convert_vit(sd, depth=args.depth, layerscale=True)
    elif args.kind == "dino":
        params = convert.convert_vit(sd, depth=args.depth, layerscale=False)
    elif args.kind == "clip":
        params = convert.convert_clip_visual(sd, layers=args.depth)
    elif args.kind == "lift":
        params = convert.convert_lift(sd)
    elif args.kind == "loftup":
        # raw LoftUp checkpoints pack ChannelNorm under 'model.1.' and the
        # upsampler under 'upsampler.' (reference: loftup/loftup.py:152-177)
        params = convert.convert_loftup_raw(sd)
    else:
        raise ValueError(args.kind)

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(flax_serialization.msgpack_serialize(params))
    print(f"Wrote {out} ({out.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()

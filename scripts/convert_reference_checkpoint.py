"""Convert a reference-trained iSegProbe .pth checkpoint into this
framework's .ckpt format, so reference users can evaluate their trained heads
directly.

Usage:
    python scripts/convert_reference_checkpoint.py \
        --input /path/to/last_checkpoint.pth --output converted.ckpt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import torch

    from isegprobe_tpu.models.convert import convert_reference_checkpoint
    from isegprobe_tpu.utils.serialization import save_checkpoint

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    out = convert_reference_checkpoint(ckpt)
    if out["config"] is None:
        raise SystemExit(
            "checkpoint has no serialized config; pass a reference checkpoint "
            "written by core/utils/misc.py:save_checkpoint"
        )
    save_checkpoint(out["params"], out["config"], args.output)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()

"""Numerics base: resize, click encoding, distance transforms, attention."""

from isegprobe_tpu.ops.dist_maps import encode_clicks
from isegprobe_tpu.ops.resize import resize, resize_matrix

__all__ = ["encode_clicks", "resize", "resize_matrix"]

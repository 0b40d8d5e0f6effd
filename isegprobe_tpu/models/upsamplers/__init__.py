"""Upsampler registry (reference: core/model/upsamplers/__init__.py:25-33)."""

from isegprobe_tpu.models.upsamplers.basic import (
    BicubicUpsampler,
    BilinearUpsampler,
    IdentityUpsampler,
    NearestUpsampler,
)

UPSAMPLER_REGISTRY = {
    "identity": IdentityUpsampler,
    "nearest": NearestUpsampler,
    "bilinear": BilinearUpsampler,
    "bicubic": BicubicUpsampler,
}


def register_upsampler(name: str, cls) -> None:
    UPSAMPLER_REGISTRY[name] = cls


def _register_learned():
    """Learned upsamplers live in separate modules to keep import cost low."""
    from isegprobe_tpu.models.upsamplers.lift import LiFTUpsampler
    from isegprobe_tpu.models.upsamplers.loftup import LoftUpUpsampler
    from isegprobe_tpu.models.upsamplers.jbu import JBUFeatUpUpsampler

    UPSAMPLER_REGISTRY.setdefault("lift", LiFTUpsampler)
    UPSAMPLER_REGISTRY.setdefault("loftup", LoftUpUpsampler)
    UPSAMPLER_REGISTRY.setdefault("jbu_featup", JBUFeatUpUpsampler)


__all__ = [
    "UPSAMPLER_REGISTRY",
    "register_upsampler",
    "IdentityUpsampler",
    "NearestUpsampler",
    "BilinearUpsampler",
    "BicubicUpsampler",
]

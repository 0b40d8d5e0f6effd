"""Model components: ViT core, featurizers, upsamplers, heads, probe model."""


def __getattr__(name):
    # lazy convenience exports (keeps `import isegprobe_tpu.models` light)
    if name == "iSegProbeModel":
        from isegprobe_tpu.models.probe_model import iSegProbeModel

        return iSegProbeModel
    if name == "ViT":
        from isegprobe_tpu.models.vit import ViT

        return ViT
    if name == "ViTConfig":
        from isegprobe_tpu.models.vit import ViTConfig

        return ViTConfig
    raise AttributeError(name)

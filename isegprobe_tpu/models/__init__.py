"""Model components: ViT core, featurizers, upsamplers, heads, probe model."""

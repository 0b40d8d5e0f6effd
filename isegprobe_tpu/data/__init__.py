"""Data layer: samples, datasets, click synthesis, augmentations."""

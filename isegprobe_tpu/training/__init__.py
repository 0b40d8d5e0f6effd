"""Training layer: losses, metrics, optimizers, trainer."""

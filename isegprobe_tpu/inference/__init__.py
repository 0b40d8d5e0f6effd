"""Inference layer: clicker, predictor, evaluation, metrics."""

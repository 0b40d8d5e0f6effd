"""iSegProbe-TPU: a TPU-native JAX framework for probing vision foundation models
and feature upsamplers via interactive segmentation.

A from-scratch rebuild of the capabilities of `havrylovv/iSegProbe` designed for
XLA/Pallas/pjit rather than ported from PyTorch. See SURVEY.md for the structural
analysis of the reference and BASELINE.md for parity targets.

Layout:
    ops/        numerics base: resize, click encoding, EDT, attention kernels
    models/     ViT core, featurizers, upsamplers, heads, composite probe model
    inference/  clicker, invertible eval transforms, predictor, NoC evaluation
    data/       datasets, click synthesis, augmentations
    training/   losses, metrics, optimizers, pjit trainer
    parallel/   device mesh + sharding rules
    utils/      config, logging, serialization, viz, misc
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls/convs default to bfloat16 input truncation; NoC parity with the
# reference (torch f32) requires full f32 precision when inputs are f32.
# bfloat16-dtype modules are unaffected (bf16 inputs stay one-pass fast).
_jax.config.update("jax_default_matmul_precision", "float32")

"""TPU-native quantized distillation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``antspy/quantized_distillation`` (ICLR'18, arXiv:1802.05668):

- weight-only uniform and non-uniform (learned-codebook) bucketed quantization
  (bucket size 256; 2/4/8-bit), with linear or abs-max per-bucket scaling and
  deterministic or stochastic rounding
  (reference: ``quantization/__init__.py`` — ``uniformQuantization`` /
  ``nonUniformQuantization``),
- straight-through-estimator fake-quant training with teacher-student
  knowledge distillation (reference: ``cnn_models/help_fun.py`` /
  ``translation_models/help_fun.py`` train loops),
- differentiable quantization — learning quantization-point locations by
  gradient descent (reference: ``quantization/help_functions.py``),
- Huffman size accounting (reference: ``quantization/help_functions.py``),
- model zoo: small CIFAR-10 CNN, WideResNet, OpenNMT-style LSTM seq2seq with
  Luong global attention + input feeding (reference: ``cnn_models/``,
  ``onmt/Models.py``),
- batched beam-search decoding and a continuous-batching serving engine
  (reference: ``onmt/Translator.py`` / ``onmt/Beam.py``),
- experiment management with checkpoint/resume (reference:
  ``model_manager.py``).

Everything is designed TPU-first: functional quant transforms under ``jit``,
Pallas fused dequant+matmul kernels with packed sub-byte weights in HBM, and
``jax.sharding`` mesh parallelism for multi-chip training and serving.
"""

__version__ = "0.1.0"

"""Model zoo: CIFAR CNN, WideResNet, ImageNet ResNets, LSTM seq2seq.

Covers the reference's ``cnn_models/`` and ``onmt/Models.py`` model families
plus the paper's ImageNet ResNet experiments.
"""

from .cnn import PRESETS as CNN_PRESETS
from .cnn import CNNSpec, ConvForwardNet, make_cnn
from .lm import LM_PRESETS, LMConfig, LSTMLanguageModel, make_lm
from .resnet import RESNET_PRESETS, BottleneckBlock, ResNet, ResNetBlock, make_resnet
from .seq2seq import (
    SEQ2SEQ_PRESETS,
    DecoderState,
    Encoder,
    LuongAttention,
    Seq2Seq,
    Seq2SeqConfig,
    make_seq2seq,
)
from .wide_resnet import WRN_PRESETS, BasicBlock, WideResNet, make_wrn

__all__ = [
    "CNN_PRESETS",
    "CNNSpec",
    "ConvForwardNet",
    "make_cnn",
    "LM_PRESETS",
    "LMConfig",
    "LSTMLanguageModel",
    "make_lm",
    "SEQ2SEQ_PRESETS",
    "DecoderState",
    "Encoder",
    "LuongAttention",
    "Seq2Seq",
    "Seq2SeqConfig",
    "make_seq2seq",
    "WRN_PRESETS",
    "BasicBlock",
    "WideResNet",
    "make_wrn",
    "RESNET_PRESETS",
    "ResNet",
    "ResNetBlock",
    "BottleneckBlock",
    "make_resnet",
]

"""tpu_viterbi — TPU-native Viterbi decoding framework.

A from-scratch JAX/Pallas rebuild of the capabilities of the reference CUDA
project (alireza-md93/GPU-Accelerated-Viterbi-Decoder): the K=7 rate-1/2
convolutional code SDR chain (bit source -> encoder -> AWGN -> quantize/pack
-> decode -> BER), a block-parallel fused BM+ACS+register-exchange decoder,
and multi-chip scaling over a jax.sharding mesh.
"""

from .config import (ChannelIn, CompMode, DecodeOut, DecoderConfig, Metric,
                     options_valid)
from .decoder.api import ViterbiTPU

__all__ = [
    "ChannelIn", "CompMode", "DecodeOut", "DecoderConfig", "Metric",
    "options_valid", "ViterbiTPU",
]

__version__ = "0.1.0"

from .channel import AddNoise, add_awgn, bpsk, snr_to_sigma
from .encode import (ConvolutionalEncoder, conv_encode, conv_encode_np,
                     conv_encode_streams)
from .pipeline import ComputeElement, Pipeline, PipelineResult
from .quantize import (SoftDecisionPacker, pack_words_2streams,
                       quantize_and_pack, quantize_fields, unpack_to_soft,
                       unpack_to_soft_np)
from .source import RandBitGen, random_bits
from .workload import packed_workload

__all__ = [
    "AddNoise", "add_awgn", "bpsk", "snr_to_sigma",
    "ConvolutionalEncoder", "conv_encode", "conv_encode_np",
    "conv_encode_streams",
    "ComputeElement", "Pipeline", "PipelineResult",
    "SoftDecisionPacker", "pack_words_2streams", "quantize_and_pack",
    "quantize_fields", "unpack_to_soft", "unpack_to_soft_np",
    "RandBitGen", "random_bits", "packed_workload",
]

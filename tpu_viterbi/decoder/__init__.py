from .api import ViterbiTPU
from .core_xla import (decode_blocks, forward_scan, gather_blocks,
                       plan_blocks, traceback_scan)
from .golden import golden_decode_block, golden_decode_full

__all__ = [
    "ViterbiTPU", "decode_blocks", "forward_scan", "gather_blocks",
    "plan_blocks", "traceback_scan", "golden_decode_block",
    "golden_decode_full",
]

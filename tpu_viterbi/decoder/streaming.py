"""Streaming decode: feed the channel stream in chunks, get decoded bits out.

The reference cannot resume across ``run()`` calls — every call re-derives
framing from scratch and the caller must present the whole message at once
(reference: src/viterbi/viterbi.cu:210-238; SURVEY.md §5 checkpoint/resume).
This module adds the capability TPU-side: a StreamingViterbi instance
buffers the undecodable tail of each chunk (the extra_l + extra_r = 64-stage
overlap-save boundary) and prepends it to the next chunk, so an arbitrarily
long stream can be decoded in fixed-size pieces with exactly the same
per-block framing/quality as the one-shot decoder.

Output alignment matches the one-shot contract: across all emitted chunks,
output bit i is the estimate of stream message bit i + extra_l.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import DecoderConfig
from .api import DEFAULT_DEC_LEN, ViterbiTPU


class StreamingViterbi:
    """Chunked decoding with carry-over of the overlap-save boundary."""

    def __init__(self, config: DecoderConfig = DecoderConfig(),
                 dec_len: int = DEFAULT_DEC_LEN, backend: str = "auto"):
        self.config = config
        self._dec = ViterbiTPU(config, dec_len=dec_len, backend=backend)
        self._carry: Optional[np.ndarray] = None  # packed words carried over

    @property
    def _values_per_word(self) -> int:
        return self.config.enc_data_per_pack

    def push(self, packed_chunk: np.ndarray) -> np.ndarray:
        """Feed packed channel words; returns packed decoded words for every
        output bit that became decodable (possibly empty).

        Chunks must be whole packed words; for bit alignment across chunks
        the chunk word count must keep stages a multiple of bits_per_pack
        (any equal-sized chunks >= 1024 words satisfy this).
        """
        cfg = self.config
        chunk = np.asarray(packed_chunk)
        if self._carry is not None:
            chunk = np.concatenate([self._carry, chunk])

        input_num = chunk.shape[0] * self._values_per_word
        message_len = cfg.get_message_len(input_num)
        if message_len <= 0:
            self._carry = chunk
            return np.zeros(0, dtype=np.uint16 if cfg.bits_per_pack == 16
                            else np.uint32)

        out, _ = self._dec.run(chunk, input_num, want_time=False)

        # carry everything from the first un-decoded message bit onward:
        # decoded bits cover stream stages [0, message_len); the next call
        # must re-see stages from message_len on (they were only used as
        # right-halo here).  message_len is a bits_per_pack multiple; carry
        # at word granularity.
        consumed_values = 2 * message_len
        consumed_words = consumed_values // self._values_per_word
        self._carry = chunk[consumed_words:]
        return out

    def flush(self) -> np.ndarray:
        """Decode whatever remains by zero-padding the right halo (the tail
        extra_r stages decode against neutral metrics, like the reference's
        final partial slide, viterbi.cu:199-206)."""
        cfg = self.config
        if self._carry is None or self._carry.shape[0] == 0:
            return np.zeros(0, dtype=np.uint16 if cfg.bits_per_pack == 16
                            else np.uint32)
        vpw = self._values_per_word
        bpp = cfg.bits_per_pack
        have_stages = self._carry.shape[0] * vpw // 2
        target_m = -(-have_stages // bpp) * bpp
        need_stages = target_m + 64 + bpp      # halo + rounding margin
        total_words = -(-2 * need_stages // vpw)
        padded = np.concatenate(
            [self._carry,
             np.zeros(total_words - self._carry.shape[0],
                      self._carry.dtype)])
        input_num = total_words * vpw
        out, _ = self._dec.run(padded, input_num, want_time=False)
        self._carry = None
        return out[: target_m // bpp]

// Native host-side hot loops for the TPU Viterbi framework.
//
// The reference implements BER accounting as a C++ bit loop over the packed
// decoder output (reference: src/main.cpp:151-171).  This library provides
// the equivalent at native speed for 32M-bit-scale messages: the decoded
// words are compared against a re-packed ground-truth word and the error
// count accumulated with popcount.
//
// Output-pack convention (must match the decoder): earliest bit in the MSB
// of each pack (reference: README.md:86-87, main.cpp:160).

#include <cstdint>

extern "C" {

// decoded: n_words packs, MSB = earliest bit.
// ref_bits: n_bits ground-truth bits ({0,1} bytes), already offset by extraL.
// Returns the number of differing bits over min(n_words*W, n_bits).
long long count_bit_errors_u32(const uint32_t* decoded, long long n_words,
                               const uint8_t* ref_bits, long long n_bits) {
    long long errors = 0;
    long long full = n_bits / 32 < n_words ? n_bits / 32 : n_words;
    for (long long w = 0; w < full; ++w) {
        uint32_t ref = 0;
        const uint8_t* rb = ref_bits + w * 32;
        for (int i = 0; i < 32; ++i) ref = (ref << 1) | (rb[i] & 1u);
        errors += __builtin_popcount(decoded[w] ^ ref);
    }
    // tail bits (partial last word)
    for (long long i = full * 32; i < n_bits && i / 32 < n_words; ++i) {
        uint32_t bit = (decoded[i / 32] >> (31 - (i % 32))) & 1u;
        errors += (bit != (ref_bits[i] & 1u));
    }
    return errors;
}

long long count_bit_errors_u16(const uint16_t* decoded, long long n_words,
                               const uint8_t* ref_bits, long long n_bits) {
    long long errors = 0;
    long long full = n_bits / 16 < n_words ? n_bits / 16 : n_words;
    for (long long w = 0; w < full; ++w) {
        uint32_t ref = 0;
        const uint8_t* rb = ref_bits + w * 16;
        for (int i = 0; i < 16; ++i) ref = (ref << 1) | (rb[i] & 1u);
        errors += __builtin_popcount((uint32_t)decoded[w] ^ ref);
    }
    for (long long i = full * 16; i < n_bits && i / 16 < n_words; ++i) {
        uint32_t bit = (decoded[i / 16] >> (15 - (i % 16))) & 1u;
        errors += (bit != (ref_bits[i] & 1u));
    }
    return errors;
}

}  // extern "C"

// Native fast path for host-side input encoding.
//
// The reference's input runtime is C++ (chunked readers + worker threads,
// reference: include/text_reader.h, include/parallel_parser.hpp); here the
// native piece is the byte->2-bit-code encoder, the only host-side loop
// that touches every input byte.  Everything downstream is device work.
//
// Build: g++ -O3 -march=native -shared -fPIC _fastio.cpp -o _fastio.so
// Bound via ctypes (kaarme_tpu/io/fastio.py); NumPy fallback exists.

#include <cstddef>
#include <cstdint>

namespace {

// byte -> code: A/a=0 C/c=1 G/g=2 T/t=3, everything else 4 (reset).
struct Lut {
    uint8_t t[256];
    constexpr Lut() : t() {
        for (int i = 0; i < 256; ++i) t[i] = 4;
        t['A'] = t['a'] = 0;
        t['C'] = t['c'] = 1;
        t['G'] = t['g'] = 2;
        t['T'] = t['t'] = 3;
    }
};
constexpr Lut kLut;

}  // namespace

extern "C" {

// Plain one-string-per-line input: every byte maps through the LUT, so a
// newline is code 4 (reset).  Output length == n.
void kt_encode_plain(const uint8_t* in, size_t n, uint8_t* out) {
    for (size_t i = 0; i < n; ++i) out[i] = kLut.t[in[i]];
}

// FASTA input: '>' anywhere opens a header that is skipped up to the next
// newline and emits one reset code 4; newlines inside sequence are
// dropped; other bytes map through the LUT.  `*in_header` carries the
// broken-header state across chunk boundaries.  Returns #codes written
// (<= n); `out` must have room for n bytes.
size_t kt_encode_fasta(const uint8_t* in, size_t n, uint8_t* out,
                       int* in_header) {
    size_t o = 0;
    int hdr = *in_header;
    for (size_t i = 0; i < n; ++i) {
        const uint8_t b = in[i];
        if (hdr) {
            if (b == '\n') {
                hdr = 0;
                out[o++] = 4;  // header terminates: reset the window
            }
            continue;
        }
        if (b == '>') {
            hdr = 1;
            continue;
        }
        if (b == '\n') continue;  // sequence wraps across lines
        out[o++] = kLut.t[b];
    }
    *in_header = hdr;
    return o;
}

}  // extern "C"

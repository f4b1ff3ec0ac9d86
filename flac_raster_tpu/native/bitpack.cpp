// Native host runtime for flac-raster-tpu: bitstream packing and CRC.
//
// Plays the role libFLAC's C bitwriter/crc play in the reference
// (SURVEY.md §2.2) -- the host-side hot loops that are not worth a device
// round-trip.  The packer consumes the SAME (value, length, offset) token
// streams the vectorized emitters produce (ops/bitpack.py documents the
// model); token bit-ranges are disjoint, so OR order is irrelevant and the
// loop is a single linear pass at memory speed.
//
// Build: cc -O3 -shared -fPIC bitpack.cpp -o libfrtpu.so   (see native.py)
// ABI: plain C functions over raw pointers, loaded with ctypes.

#include <cstdint>
#include <cstring>

extern "C" {

// Scatter-OR tokens into a byte buffer (MSB-first bit addressing).
// values: low `lengths[i]` bits are written at absolute bit offset
// `offsets[i]`.  Buffer must be zero-initialized and large enough.
void pack_tokens_c(const uint64_t* values,
                   const int64_t* lengths,
                   const int64_t* offsets,
                   int64_t n,
                   uint8_t* out,
                   int64_t out_bytes) {
    (void)out_bytes;
    for (int64_t i = 0; i < n; ++i) {
        int64_t len = lengths[i];
        if (len <= 0) continue;
        uint64_t v = values[i];
        if (len < 64) v &= (1ULL << len) - 1ULL;
        int64_t off = offsets[i];
        int64_t byte0 = off >> 3;
        int bit_in = (int)(off & 7);
        // write into up to 9 bytes, MSB-first
        int total = bit_in + (int)len;          // bits spanned from byte0
        int nbytes = (total + 7) >> 3;
        // align value to the top of the nbytes window
        int pad = nbytes * 8 - total;
        unsigned __int128 wide = (unsigned __int128)v << pad;
        for (int b = nbytes - 1; b >= 0; --b) {
            out[byte0 + b] |= (uint8_t)(wide & 0xFF);
            wide >>= 8;
        }
    }
}

// CRC-8 (poly 0x07, init 0) over each row span of a byte buffer; writes the
// CRC at out[i].
void crc8_spans_c(const uint8_t* buf,
                  const int64_t* starts,
                  const int64_t* lens,
                  int64_t n,
                  uint8_t* out) {
    static uint8_t table[256];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < 256; ++i) {
            uint8_t c = (uint8_t)i;
            for (int k = 0; k < 8; ++k)
                c = (uint8_t)((c << 1) ^ ((c & 0x80) ? 0x07 : 0));
            table[i] = c;
        }
        init = true;
    }
    for (int64_t i = 0; i < n; ++i) {
        uint8_t crc = 0;
        const uint8_t* p = buf + starts[i];
        for (int64_t j = 0; j < lens[i]; ++j) crc = table[crc ^ p[j]];
        out[i] = crc;
    }
}

// CRC-16 (poly 0x8005, init 0) over each row span; writes big-endian at
// buf[starts[i] + lens[i]] (i.e. patches the trailing CRC in place).
void crc16_patch_spans_c(uint8_t* buf,
                         const int64_t* starts,
                         const int64_t* lens,
                         int64_t n) {
    static uint16_t table[256];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < 256; ++i) {
            uint16_t c = (uint16_t)(i << 8);
            for (int k = 0; k < 8; ++k)
                c = (uint16_t)((c << 1) ^ ((c & 0x8000) ? 0x8005 : 0));
            table[i] = c;
        }
        init = true;
    }
    for (int64_t i = 0; i < n; ++i) {
        uint16_t crc = 0;
        uint8_t* p = buf + starts[i];
        for (int64_t j = 0; j < lens[i]; ++j)
            crc = (uint16_t)((crc << 8) ^ table[(crc >> 8) ^ p[j]]);
        p[lens[i]] = (uint8_t)(crc >> 8);
        p[lens[i] + 1] = (uint8_t)(crc & 0xFF);
    }
}

// CRC-8 patch variant: writes the crc8 at buf[starts[i] + lens[i]].
void crc8_patch_spans_c(uint8_t* buf,
                        const int64_t* starts,
                        const int64_t* lens,
                        int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        crc8_spans_c(buf, starts + i, lens + i, 1, buf + starts[i] + lens[i]);
    }
}

}  // extern "C"

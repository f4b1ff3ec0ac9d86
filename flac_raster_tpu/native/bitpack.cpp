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

// ---------------------------------------------------------------------------
// Decode-side native hot loops
// ---------------------------------------------------------------------------

namespace {

// MSB-first bit reader with a 64-bit refill cache.
struct BitRd {
    const uint8_t* buf;
    int64_t nbits;
    int64_t pos;
    bool ok;
    BitRd(const uint8_t* b, int64_t total_bits, int64_t p)
        : buf(b), nbits(total_bits), pos(p), ok(true) {}
    inline uint64_t read(int n) {  // n in [0, 57]
        if (pos + n > nbits) { ok = false; return 0; }
        int64_t byte0 = pos >> 3;
        int drop = (int)(pos & 7);
        uint64_t acc = 0;
        int have = 0;
        // load up to 8 bytes starting at byte0
        for (int i = 0; i < 8 && have < drop + n; ++i) {
            acc = (acc << 8) | buf[byte0 + i];
            have += 8;
        }
        acc >>= (have - drop - n);
        pos += n;
        return n >= 64 ? acc : (acc & ((1ULL << n) - 1ULL));
    }
    inline int64_t read_unary() {
        // count zero bits until the terminating 1
        int64_t q = 0;
        while (true) {
            if (pos >= nbits) { ok = false; return 0; }
            int64_t byte0 = pos >> 3;
            int bit_in = (int)(pos & 7);
            uint8_t cur = (uint8_t)(buf[byte0] << bit_in);
            if (cur == 0) {            // rest of byte is zeros
                q += 8 - bit_in;
                pos += 8 - bit_in;
                continue;
            }
            int lead = 0;              // leading zeros in the remaining bits
            while (!(cur & 0x80)) { cur <<= 1; ++lead; }
            q += lead;
            pos += lead + 1;           // consume zeros + terminator
            return q;
        }
    }
};

}  // namespace

extern "C" {

// Decode the full residual section of one subframe:
// [2b method][4b partition order]( [k][codes...] )*
// Writes blocksize-order residuals; returns new bit position or a negative
// error code (-1 malformed, -2 out of data).
int64_t decode_residual_c(const uint8_t* buf,
                          int64_t total_bits,
                          int64_t bit_pos,
                          int32_t blocksize,
                          int32_t order,
                          int64_t* out) {
    BitRd br(buf, total_bits, bit_pos);
    uint32_t method = (uint32_t)br.read(2);
    if (method > 1) return -1;
    int pbits = method == 0 ? 4 : 5;
    uint32_t escape = (1u << pbits) - 1u;
    uint32_t part_order = (uint32_t)br.read(4);
    int32_t n_parts = 1 << part_order;
    int32_t base = blocksize >> part_order;
    if ((base << part_order) != blocksize || base <= order) return -1;
    int64_t* o = out;
    for (int32_t p = 0; p < n_parts; ++p) {
        int32_t count = (p == 0) ? base - order : base;
        uint32_t k = (uint32_t)br.read(pbits);
        if (!br.ok) return -2;
        if (k == escape) {
            uint32_t raw = (uint32_t)br.read(5);
            if (raw == 0) {
                for (int32_t i = 0; i < count; ++i) *o++ = 0;
            } else {
                uint64_t sign = 1ULL << (raw - 1);
                for (int32_t i = 0; i < count; ++i) {
                    uint64_t v = br.read((int)raw);
                    *o++ = (int64_t)((v ^ sign) - sign);
                }
            }
        } else {
            for (int32_t i = 0; i < count; ++i) {
                uint64_t q = (uint64_t)br.read_unary();
                uint64_t z = (q << k) | br.read((int)k);
                *o++ = (int64_t)(z >> 1) ^ -(int64_t)(z & 1);
            }
        }
        if (!br.ok) return -2;
    }
    return br.pos;
}

// CRC-16 over spans, results written to out (no patching).
void crc16_spans_check_c(const uint8_t* buf,
                         const int64_t* starts,
                         const int64_t* lens,
                         int64_t n,
                         uint16_t* out) {
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
        const uint8_t* p = buf + starts[i];
        for (int64_t j = 0; j < lens[i]; ++j)
            crc = (uint16_t)((crc << 8) ^ table[(crc >> 8) ^ p[j]]);
        out[i] = crc;
    }
}

}  // extern "C"

extern "C" {

// Batched LPC restore: integer IIR x[i] = res[i-order] + ((sum c_j * x[i-1-j]) >> shift)
// warmups (b, order), residuals (b, max_len-order), qcoeffs (b, order),
// shifts (b,), out (b, max_len).  Rows are independent.
void lpc_restore_c(const int64_t* warmups,
                   const int64_t* residuals,
                   const int64_t* qcoeffs,
                   const int64_t* shifts,
                   int64_t b,
                   int64_t order,
                   int64_t max_len,
                   int64_t* out) {
    int64_t res_len = max_len - order;
    for (int64_t r = 0; r < b; ++r) {
        int64_t* x = out + r * max_len;
        const int64_t* c = qcoeffs + r * order;
        const int64_t* res = residuals + r * res_len;
        int64_t sh = shifts[r];
        for (int64_t j = 0; j < order; ++j) x[j] = warmups[r * order + j];
        for (int64_t i = order; i < max_len; ++i) {
            int64_t acc = 0;
            for (int64_t j = 0; j < order; ++j) acc += c[j] * x[i - 1 - j];
            x[i] = res[i - order] + (acc >> sh);
        }
    }
}

}  // extern "C"

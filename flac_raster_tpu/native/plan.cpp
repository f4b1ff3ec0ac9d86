// Native host planner for flac-raster-tpu: the integer 95% of plan_blocks.
//
// ops/device_codec.plan_blocks splits into a small float stage (apodize,
// autocorrelation, Levinson-Durbin, coefficient quantization -- still jitted
// XLA, see analyze_lpc_windows) and a large integer stage: fixed-order
// residuals, zigzag, the exact Rice parameter search over partition orders,
// and candidate selection.  This file is that integer stage, replicated
// operation-for-operation (same uint32 wraparound, same _BIG saturation,
// same first-minimum argmin tie-breaks), so the emitted bytes are identical
// to the XLA planner's by construction -- tests/test_native_planner.py
// asserts it stream-for-stream.
//
// Plays the role libFLAC's C encoder core plays in the reference
// (SURVEY.md §2.2) for hosts without an accelerator: the Rice cost loop is
// 21 shift+min+add passes over each 256-byte partition, which the compiler
// vectorizes (-march=native, AVX-512 on the dev box).
//
// ABI: plain C over raw pointers, loaded with ctypes (see native/__init__).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int KMAX = 20;                    // device_codec.KMAX
constexpr int N_OPTS = 14;                  // (max_po+1) * 2 at max_po = 6
constexpr uint32_t QCLAMP = 1u << 17;       // device_codec._QCLAMP
constexpr int64_t BIG = 1ll << 29;          // device_codec._BIG
constexpr uint32_t MAX_TOKEN = 32;          // device_codec.MAX_RICE_TOKEN_BITS

struct RiceResult {
    int32_t method = 0;
    int32_t po = 0;
    int32_t ks[64] = {0};
    int64_t payload = BIG;
    bool valid = false;
};

// Exact replica of device_codec._rice_search for one block row.
// z: (N,) zigzag residuals with positions < order already zeroed.
void rice_search_row(const uint32_t* z, int64_t n, int32_t order,
                     int32_t max_po, RiceResult* out) {
    const int parts = 1 << max_po;
    const int64_t base = n >> max_po;

    // cost[k][p] at the finest partition order (+ counts*(k+1)), BIG where
    // any token would exceed MAX_TOKEN bits (uint32 wraparound in the
    // validity sum mirrors the XLA expression exactly)
    int64_t cost[KMAX + 1][64];
    for (int p = 0; p < parts; ++p) {
        const uint32_t* zp = z + p * base;
        uint32_t zmax = 0;
        for (int64_t i = 0; i < base; ++i)
            zmax = zp[i] > zmax ? zp[i] : zmax;
        const int64_t cnt = p == 0 ? base - order : base;
        for (int k = 0; k <= KMAX; ++k) {
            // exact shortcuts: an invalid (k, partition) never needs its
            // sum (the XLA code replaces it with BIG before any use), and
            // once zmax >> k == 0 every quotient is zero so the sum term
            // vanishes -- only the narrow valid band pays the inner loop
            const bool ok =
                (uint32_t)((zmax >> k) + 1u + (uint32_t)k) <= MAX_TOKEN;
            if (!ok) {
                cost[k][p] = BIG;
                continue;
            }
            if ((zmax >> k) == 0) {
                cost[k][p] = cnt * (k + 1);
                continue;
            }
            uint64_t s = 0;
            for (int64_t i = 0; i < base; ++i) {
                uint32_t q = zp[i] >> k;
                s += q < QCLAMP ? q : QCLAMP;
            }
            cost[k][p] = (int64_t)s + cnt * (k + 1);
        }
    }

    // options: for each partition order (max_po down to 0) two encodings,
    // 4-bit parameters capped at k<=14 and 5-bit parameters k<=KMAX
    int64_t totals[N_OPTS];
    int32_t ks_opt[N_OPTS][64];
    std::memset(ks_opt, 0, sizeof(int32_t) * N_OPTS * 64);
    int opt = 0;
    for (int po = max_po;; --po) {
        const int nparts = 1 << po;
        static const int PBITS[2] = {4, 5};
        static const int KCAP[2] = {14, KMAX};
        for (int m = 0; m < 2; ++m) {
            int64_t tot = 0;
            bool bad = false;
            for (int p = 0; p < nparts; ++p) {
                int bk = 0;
                int64_t bc = cost[0][p];
                for (int k = 1; k <= KCAP[m]; ++k)
                    if (cost[k][p] < bc) { bc = cost[k][p]; bk = k; }
                ks_opt[opt][p] = bk;
                tot += bc;
                bad |= bc >= BIG;
            }
            totals[opt] = bad ? BIG : tot + PBITS[m] * nparts;
            ++opt;
        }
        if (po == 0)
            break;
        // merge partition pairs upward, saturating at BIG like the XLA code
        for (int k = 0; k <= KMAX; ++k)
            for (int p = 0; p < nparts / 2; ++p) {
                const int64_t s = cost[k][2 * p] + cost[k][2 * p + 1];
                cost[k][p] = s < BIG ? s : BIG;
            }
    }

    int choice = 0;
    for (int i = 1; i < opt; ++i)
        if (totals[i] < totals[choice])
            choice = i;
    out->method = choice % 2;
    out->po = max_po - choice / 2;
    std::memcpy(out->ks, ks_opt[choice], sizeof(out->ks));
    out->payload = totals[choice];
    out->valid = totals[choice] < BIG;
}

inline uint32_t zigzag(int32_t v) {
    return ((uint32_t)v << 1) ^ (uint32_t)(v >> 31);
}

}  // namespace

extern "C" {

// Integer remainder of plan_blocks given the jitted float analysis.
// Inputs:
//   x         (B, N) int32 samples
//   bps_e     (B,) int32 effective bit depths
//   W LPC window candidates from analyze_lpc_windows (W may be 0):
//   r_lpc     (W, B, N) int32 exact LPC residuals (garbage below order)
//   order_arr (W, B) int32 estimated-best orders
//   qc_in     (W, B, qslots) int32 quantized coefficients
//   shift_in  (W, B) int32
//   lpc_safe  (W, B) uint8 overflow-guard verdicts
// Outputs (preallocated): the plan_blocks dict fields.
void plan_rice_i32_c(
    const int32_t* x, const int32_t* bps_e, int64_t B, int64_t N,
    int32_t max_po, int64_t W, const int32_t* r_lpc,
    const int32_t* order_arr, const int32_t* qc_in, const int32_t* shift_in,
    const uint8_t* lpc_safe, int32_t qslots, int32_t precision,
    int32_t order_slots, int32_t* kind, int32_t* order_out, int32_t* method_o,
    int32_t* po_o, int32_t* ks_o, int32_t* shift_o, int32_t* qc_o,
    int32_t* resid_o, int32_t* bits_o, int32_t* const_o) {
    std::vector<uint32_t> fixed_r(5 * N);  // residual stages 0..4
    std::vector<uint32_t> z(N);

    for (int64_t b = 0; b < B; ++b) {
        const int32_t* xb = x + b * N;
        const int64_t bps = bps_e[b];

        bool is_const = true;
        for (int64_t i = 1; i < N && is_const; ++i)
            is_const = xb[i] == xb[0];
        const int64_t verbatim_bits = 8 + N * bps;

        // fixed orders 0..4: iterative wraparound diffs, exact Rice search
        int64_t cand_bits[7];
        RiceResult cand[5];
        uint32_t* r = fixed_r.data();
        for (int64_t i = 0; i < N; ++i)
            r[i] = (uint32_t)xb[i];
        for (int o = 0; o < 5; ++o) {
            uint32_t* ro = fixed_r.data() + o * N;
            if (o) {
                const uint32_t* rp = fixed_r.data() + (o - 1) * N;
                ro[0] = rp[0];
                for (int64_t i = N - 1; i >= 1; --i)
                    ro[i] = rp[i] - rp[i - 1];
            }
            for (int64_t i = 0; i < N; ++i)
                z[i] = i < o ? 0u : zigzag((int32_t)ro[i]);
            rice_search_row(z.data(), N, o, max_po, &cand[o]);
            cand_bits[o] = cand[o].valid
                               ? 8 + o * bps + 2 + 4 + cand[o].payload
                               : BIG;
        }

        // LPC windows: merged by strictly-smaller bit count, window 0 is the
        // unconditional baseline (mirrors the XLA where-chain)
        RiceResult lw{};
        int64_t lpc_bits = BIG;
        int32_t lorder = 0, lshift = 0;
        const int32_t* lqc = nullptr;
        const int32_t* lres = nullptr;
        for (int64_t w = 0; w < W; ++w) {
            const int64_t wb = w * B + b;
            const int32_t ob = order_arr[wb];
            const int32_t* rw = r_lpc + wb * N;
            for (int64_t i = 0; i < N; ++i)
                z[i] = i < ob ? 0u : zigzag(rw[i]);
            RiceResult rr;
            rice_search_row(z.data(), N, ob, max_po, &rr);
            const int64_t bits =
                rr.valid && lpc_safe[wb]
                    ? 8 + ob * bps + 4 + 5 + (int64_t)ob * precision + 2 + 4 +
                          rr.payload
                    : BIG;
            if (w == 0 || bits < lpc_bits) {
                lw = rr;
                lpc_bits = bits;
                lorder = ob;
                lshift = shift_in[wb];
                lqc = qc_in + wb * qslots;
                lres = rw;
            }
        }

        // choose across {fixed 0..4, lpc, verbatim}: first minimum wins
        cand_bits[5] = lpc_bits;
        cand_bits[6] = verbatim_bits;
        int best = 0;
        for (int i = 1; i < 7; ++i)
            if (cand_bits[i] < cand_bits[best])
                best = i;
        const bool is_lpc = best == 5;
        const bool is_verb = best == 6;

        int32_t kd = is_const ? 0 : (is_verb ? 1 : (is_lpc ? 3 : 2));
        int32_t oo = is_const || is_verb ? 0 : (is_lpc ? lorder : best);
        const bool has_resid = kd == 2 || kd == 3;

        kind[b] = kd;
        order_out[b] = oo;
        const RiceResult& sel = best <= 4 ? cand[best] : lw;
        method_o[b] = has_resid ? sel.method : 0;
        po_o[b] = has_resid ? sel.po : 0;
        if (has_resid)
            std::memcpy(ks_o + b * 64, sel.ks, sizeof(sel.ks));
        else
            std::memset(ks_o + b * 64, 0, sizeof(sel.ks));
        shift_o[b] = lshift;
        std::memset(qc_o + b * order_slots, 0,
                    sizeof(int32_t) * order_slots);
        if (lqc != nullptr)
            std::memcpy(qc_o + b * order_slots, lqc,
                        sizeof(int32_t) * qslots);

        // residual: selected candidate's (the merged LPC row also backs the
        // verbatim case, exactly like the XLA where-chain), warmup zeroed
        int32_t* rout = resid_o + b * N;
        if (best <= 4) {
            const uint32_t* ro = fixed_r.data() + best * N;
            for (int64_t i = 0; i < N; ++i)
                rout[i] = i < oo ? 0 : (int32_t)ro[i];
        } else if (lres != nullptr) {
            for (int64_t i = 0; i < N; ++i)
                rout[i] = i < oo ? 0 : lres[i];
        } else {
            std::memset(rout, 0, sizeof(int32_t) * N);
        }

        bits_o[b] = (int32_t)(is_const ? 8 + bps
                              : is_verb ? verbatim_bits
                                        : cand_bits[best]);
        const_o[b] = xb[0];
    }
}

}  // extern "C"

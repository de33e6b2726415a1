// Byte-aligned rANS range coder with escape/bypass coding.
//
// TPU-native rebuild of the entropy-coding stage the reference gets from
// CompressAI's C++ rANS (invoked at sc2bench/models/layer.py:506,520,643-665).
// Runs on host (same placement as the reference: bitstream production is
// serial and CPU-bound); symbols/indexes arrive as int32 arrays produced on
// the TPU. Exposed through ctypes (no pybind11 in this image).
//
// Design: 32-bit rANS state, 8-bit renormalization, 16-bit probability
// precision. Out-of-range symbols escape to the final CDF slot and the
// overflow magnitude is bypass-coded in 4-bit chunks (count first, unary in
// base-15, then LSB-first chunks). Encoding walks the op list in reverse so
// the decoder reads forward.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kRansL = 1u << 23;   // lower bound of the state interval
constexpr int kPrecision = 16;          // probability bits
constexpr int kBypassBits = 4;
constexpr int32_t kMaxBypass = (1 << kBypassBits) - 1;

struct RansEncState {
    uint32_t x = kRansL;
    std::vector<uint8_t> buf;  // filled back-to-front conceptually; we push and reverse

    inline void put(uint32_t start, uint32_t freq) {
        uint32_t x_max = ((kRansL >> kPrecision) << 8) * freq;
        while (x >= x_max) {
            buf.push_back(static_cast<uint8_t>(x & 0xff));
            x >>= 8;
        }
        x = ((x / freq) << kPrecision) + (x % freq) + start;
    }

    // Append `kBypassBits` raw bits (value in [0, kMaxBypass]) as a uniform
    // symbol: start = val << (precision - bits), freq = 1 << (precision - bits).
    inline void put_bypass(uint32_t val) {
        constexpr uint32_t freq = 1u << (kPrecision - kBypassBits);
        put(val << (kPrecision - kBypassBits), freq);
    }

    inline void flush() {
        for (int i = 0; i < 4; ++i) {
            buf.push_back(static_cast<uint8_t>(x & 0xff));
            x >>= 8;
        }
    }
};

struct RansDecState {
    uint32_t x = 0;
    const uint8_t* ptr;
    const uint8_t* end;

    inline void init(const uint8_t* bytes, int n) {
        // Stream is stored with the flush bytes first (encoder output is
        // reversed): read 4 state bytes big-to-small.
        ptr = bytes;
        end = bytes + n;
        x = 0;
        for (int i = 0; i < 4; ++i)
            x = (x << 8) | (ptr < end ? *ptr++ : 0);
    }

    inline uint32_t peek() const { return x & ((1u << kPrecision) - 1); }

    inline void advance(uint32_t start, uint32_t freq) {
        x = freq * (x >> kPrecision) + peek() - start;
        while (x < kRansL)
            x = (x << 8) | (ptr < end ? *ptr++ : 0);
    }

    inline uint32_t get_bypass() {
        uint32_t slot = peek();
        uint32_t val = slot >> (kPrecision - kBypassBits);
        constexpr uint32_t freq = 1u << (kPrecision - kBypassBits);
        advance(val << (kPrecision - kBypassBits), freq);
        return val;
    }
};

struct Op {
    uint32_t start;
    uint32_t freq;
};

}  // namespace

namespace {

inline void emit_symbol_ops(std::vector<Op>& ops, const int32_t* cdf,
                            int32_t max_value, int32_t value) {
    uint32_t raw_val = 0;
    bool escape = false;
    if (value < 0) {
        raw_val = static_cast<uint32_t>(-2 * value - 1);
        value = max_value;
        escape = true;
    } else if (value >= max_value) {
        raw_val = static_cast<uint32_t>(2 * (value - max_value));
        value = max_value;
        escape = true;
    }
    ops.push_back({static_cast<uint32_t>(cdf[value]),
                   static_cast<uint32_t>(cdf[value + 1] - cdf[value])});
    if (escape) {
        int32_t n_bypass = 0;
        while ((raw_val >> (n_bypass * kBypassBits)) != 0) ++n_bypass;
        int32_t val = n_bypass;
        while (val >= kMaxBypass) {
            ops.push_back({static_cast<uint32_t>(kMaxBypass)
                               << (kPrecision - kBypassBits),
                           1u << (kPrecision - kBypassBits)});
            val -= kMaxBypass;
        }
        ops.push_back({static_cast<uint32_t>(val)
                           << (kPrecision - kBypassBits),
                       1u << (kPrecision - kBypassBits)});
        for (int32_t j = 0; j < n_bypass; ++j) {
            uint32_t chunk = (raw_val >> (j * kBypassBits)) & kMaxBypass;
            ops.push_back({chunk << (kPrecision - kBypassBits),
                           1u << (kPrecision - kBypassBits)});
        }
    }
}

inline int32_t read_symbol_escape(RansDecState& dec, int32_t max_value) {
    int32_t n_bypass = 0;
    uint32_t val;
    do {
        val = dec.get_bypass();
        n_bypass += static_cast<int32_t>(val);
    } while (val == static_cast<uint32_t>(kMaxBypass));
    uint32_t raw_val = 0;
    for (int32_t j = 0; j < n_bypass; ++j)
        raw_val |= dec.get_bypass() << (j * kBypassBits);
    return (raw_val & 1) ? -static_cast<int32_t>((raw_val + 1) >> 1)
                         : static_cast<int32_t>(raw_val >> 1) + max_value;
}

}  // namespace


extern "C" {

// Encode n symbols. cdfs is row-major (num_dists, cdf_stride); row i holds
// cdf_lengths[i] int32 entries, cdf[0]=0 .. cdf[len-1]=65536. Returns number
// of bytes written to `out`, or -1 if out_capacity is insufficient.
int rans_encode_with_indexes(const int32_t* symbols, const int32_t* indexes,
                             int n, const int32_t* cdfs, int cdf_stride,
                             const int32_t* cdf_lengths, const int32_t* offsets,
                             uint8_t* out, int out_capacity) {
    std::vector<Op> ops;
    ops.reserve(static_cast<size_t>(n) + 16);
    for (int i = 0; i < n; ++i) {
        const int32_t idx = indexes[i];
        const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
        const int32_t cdf_len = cdf_lengths[idx];
        emit_symbol_ops(ops, cdf, cdf_len - 2, symbols[i] - offsets[idx]);
    }

    RansEncState enc;
    enc.buf.reserve(static_cast<size_t>(n) * 2 + 8);
    for (auto it = ops.rbegin(); it != ops.rend(); ++it)
        enc.put(it->start, it->freq);
    enc.flush();

    const int total = static_cast<int>(enc.buf.size());
    if (total > out_capacity) return -1;
    // Reverse: decoder reads flush bytes first, then ops forward.
    for (int i = 0; i < total; ++i)
        out[i] = enc.buf[total - 1 - i];
    return total;
}

// Decode n symbols from `bytes`. Writes int32 values (offset re-applied).
int rans_decode_with_indexes(const uint8_t* bytes, int n_bytes,
                             const int32_t* indexes, int n,
                             const int32_t* cdfs, int cdf_stride,
                             const int32_t* cdf_lengths, const int32_t* offsets,
                             int32_t* out) {
    RansDecState dec;
    dec.init(bytes, n_bytes);
    for (int i = 0; i < n; ++i) {
        const int32_t idx = indexes[i];
        const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
        const int32_t cdf_len = cdf_lengths[idx];
        const int32_t max_value = cdf_len - 2;
        const uint32_t slot = dec.peek();
        // binary search: largest s with cdf[s] <= slot
        int lo = 0, hi = cdf_len - 1;
        while (hi - lo > 1) {
            int mid = (lo + hi) >> 1;
            if (static_cast<uint32_t>(cdf[mid]) <= slot) lo = mid;
            else hi = mid;
        }
        const int s = lo;
        dec.advance(static_cast<uint32_t>(cdf[s]),
                    static_cast<uint32_t>(cdf[s + 1] - cdf[s]));
        int32_t value = (s == max_value)
            ? read_symbol_escape(dec, max_value) : s;
        out[i] = value + offsets[idx];
    }
    return 0;
}

// Batched encode: m independent messages laid out contiguously.
// lengths[j] symbols per message; out buffer partitioned by out_stride.
// Returns 0; per-message byte counts written to out_sizes (or -1 on overflow).
int rans_encode_batch(const int32_t* symbols, const int32_t* indexes,
                      const int32_t* lengths, int m, const int32_t* cdfs,
                      int cdf_stride, const int32_t* cdf_lengths,
                      const int32_t* offsets, uint8_t* out, int out_stride,
                      int32_t* out_sizes) {
    int64_t pos = 0;
    for (int j = 0; j < m; ++j) {
        out_sizes[j] = rans_encode_with_indexes(
            symbols + pos, indexes + pos, lengths[j], cdfs, cdf_stride,
            cdf_lengths, offsets, out + static_cast<int64_t>(j) * out_stride,
            out_stride);
        pos += lengths[j];
    }
    return 0;
}

int rans_decode_batch(const uint8_t* bytes, const int32_t* byte_sizes,
                      int byte_stride, const int32_t* indexes,
                      const int32_t* lengths, int m, const int32_t* cdfs,
                      int cdf_stride, const int32_t* cdf_lengths,
                      const int32_t* offsets, int32_t* out) {
    int64_t pos = 0;
    for (int j = 0; j < m; ++j) {
        rans_decode_with_indexes(
            bytes + static_cast<int64_t>(j) * byte_stride, byte_sizes[j],
            indexes + pos, lengths[j], cdfs, cdf_stride, cdf_lengths, offsets,
            out + pos);
        pos += lengths[j];
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Interleaved multi-lane rANS: lane j codes symbols j, j+L, j+2L, ... with an
// independent state and buffer. Lanes decode in parallel (OpenMP when
// available) and the per-lane inner loops expose ILP that the serial
// single-stream coder cannot. Stream layout: int32 lane count, int32 per-lane
// byte sizes, then concatenated lane payloads.
// ---------------------------------------------------------------------------

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

int rans_encode_interleaved(const int32_t* symbols, const int32_t* indexes,
                            int n, int num_lanes, const int32_t* cdfs,
                            int cdf_stride, const int32_t* cdf_lengths,
                            const int32_t* offsets, uint8_t* out,
                            int out_capacity) {
    if (num_lanes < 1) num_lanes = 1;
    std::vector<std::vector<uint8_t>> lanes(num_lanes);
    std::vector<int> lane_sizes(num_lanes, 0);
    bool overflow = false;

#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int lane = 0; lane < num_lanes; ++lane) {
        // gather this lane's ops in forward order, then encode in reverse
        std::vector<Op> ops;
        ops.reserve(n / num_lanes + 8);
        for (int i = lane; i < n; i += num_lanes) {
            const int32_t idx = indexes[i];
            const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
            const int32_t cdf_len = cdf_lengths[idx];
            emit_symbol_ops(ops, cdf, cdf_len - 2,
                            symbols[i] - offsets[idx]);
        }
        RansEncState enc;
        enc.buf.reserve(ops.size() * 2 + 8);
        for (auto it = ops.rbegin(); it != ops.rend(); ++it)
            enc.put(it->start, it->freq);
        enc.flush();
        // reverse in place
        std::vector<uint8_t> rev(enc.buf.rbegin(), enc.buf.rend());
        lanes[lane] = std::move(rev);
        lane_sizes[lane] = static_cast<int>(lanes[lane].size());
    }

    int64_t total = 4 + 4 * static_cast<int64_t>(num_lanes);
    for (int lane = 0; lane < num_lanes; ++lane) total += lane_sizes[lane];
    if (total > out_capacity) return -1;
    uint8_t* p = out;
    std::memcpy(p, &num_lanes, 4); p += 4;
    for (int lane = 0; lane < num_lanes; ++lane) {
        std::memcpy(p, &lane_sizes[lane], 4); p += 4;
    }
    for (int lane = 0; lane < num_lanes; ++lane) {
        std::memcpy(p, lanes[lane].data(), lane_sizes[lane]);
        p += lane_sizes[lane];
    }
    (void)overflow;
    return static_cast<int>(total);
}

int rans_decode_interleaved(const uint8_t* bytes, int n_bytes,
                            const int32_t* indexes, int n,
                            const int32_t* cdfs, int cdf_stride,
                            const int32_t* cdf_lengths,
                            const int32_t* offsets, int32_t* out) {
    if (n_bytes < 4) return -1;
    int32_t num_lanes = 0;
    std::memcpy(&num_lanes, bytes, 4);
    if (num_lanes < 1 || 4 + 4 * num_lanes > n_bytes) return -1;
    std::vector<int32_t> lane_sizes(num_lanes);
    std::vector<int64_t> lane_offsets_(num_lanes);
    int64_t pos = 4 + 4 * static_cast<int64_t>(num_lanes);
    for (int lane = 0; lane < num_lanes; ++lane) {
        std::memcpy(&lane_sizes[lane], bytes + 4 + 4 * lane, 4);
        lane_offsets_[lane] = pos;
        pos += lane_sizes[lane];
    }
    if (pos > n_bytes) return -1;

#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int lane = 0; lane < num_lanes; ++lane) {
        RansDecState dec;
        dec.init(bytes + lane_offsets_[lane], lane_sizes[lane]);
        for (int i = lane; i < n; i += num_lanes) {
            const int32_t idx = indexes[i];
            const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
            const int32_t cdf_len = cdf_lengths[idx];
            const int32_t max_value = cdf_len - 2;
            const uint32_t slot = dec.peek();
            int lo = 0, hi = cdf_len - 1;
            while (hi - lo > 1) {
                int mid = (lo + hi) >> 1;
                if (static_cast<uint32_t>(cdf[mid]) <= slot) lo = mid;
                else hi = mid;
            }
            const int s = lo;
            dec.advance(static_cast<uint32_t>(cdf[s]),
                        static_cast<uint32_t>(cdf[s + 1] - cdf[s]));
            int32_t value = (s == max_value)
                ? read_symbol_escape(dec, max_value) : s;
            out[i] = value + offsets[idx];
        }
    }
    return 0;
}

}  // extern "C"


// ---------------------------------------------------------------------------
// Cyclic int16 fast path: symbols arrive in the device's natural NHWC-flat
// (channels-last) order and symbol i uses distribution (i % num_dists), so no
// index array, transpose, or int32 widening is ever materialized on the host.
// The bitstream format is identical to rans_encode_with_indexes (byte content
// differs only through symbol order). Decode emits the int16 wire dtype that
// goes straight back to the device.
// ---------------------------------------------------------------------------


extern "C" {

int rans_encode_cyclic_i16(const int16_t* symbols, int n, int num_dists,
                           const int32_t* cdfs, int cdf_stride,
                           const int32_t* cdf_lengths, const int32_t* offsets,
                           uint8_t* out, int out_capacity) {
    std::vector<Op> ops;
    ops.reserve(static_cast<size_t>(n) + 16);
    int idx = 0;
    for (int i = 0; i < n; ++i) {
        const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
        emit_symbol_ops(ops, cdf, cdf_lengths[idx] - 2,
                        static_cast<int32_t>(symbols[i]) - offsets[idx]);
        if (++idx == num_dists) idx = 0;
    }
    RansEncState enc;
    enc.buf.reserve(static_cast<size_t>(n) * 2 + 8);
    for (auto it = ops.rbegin(); it != ops.rend(); ++it)
        enc.put(it->start, it->freq);
    enc.flush();
    const int total = static_cast<int>(enc.buf.size());
    if (total > out_capacity) return -1;
    for (int i = 0; i < total; ++i)
        out[i] = enc.buf[total - 1 - i];
    return total;
}


}  // extern "C"

// ---------------------------------------------------------------------------
// Streaming decode: persist (x, byte position) across calls so a consumer
// with data-dependent indexes (the mbt2018 autoregressive context model,
// reference layer.py's JAHP path) can decode a chunk per wavefront instead
// of one symbol at a time in Python. state = int64[2] {x, pos}.
// ---------------------------------------------------------------------------

extern "C" {

void rans_stream_init(const uint8_t* bytes, int n_bytes, int64_t* state) {
    RansDecState dec;
    dec.init(bytes, n_bytes);
    state[0] = static_cast<int64_t>(dec.x);
    state[1] = static_cast<int64_t>(dec.ptr - bytes);
}

int rans_stream_decode(const uint8_t* bytes, int n_bytes, int64_t* state,
                       const int32_t* indexes, int n, const int32_t* cdfs,
                       int cdf_stride, const int32_t* cdf_lengths,
                       const int32_t* offsets, int32_t* out) {
    RansDecState dec;
    dec.x = static_cast<uint32_t>(state[0]);
    dec.ptr = bytes + state[1];
    dec.end = bytes + n_bytes;
    for (int i = 0; i < n; ++i) {
        const int32_t idx = indexes[i];
        const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
        const int32_t cdf_len = cdf_lengths[idx];
        const int32_t max_value = cdf_len - 2;
        const uint32_t slot = dec.peek();
        int lo = 0, hi = cdf_len - 1;
        while (hi - lo > 1) {
            int mid = (lo + hi) >> 1;
            if (static_cast<uint32_t>(cdf[mid]) <= slot) lo = mid;
            else hi = mid;
        }
        const int s = lo;
        dec.advance(static_cast<uint32_t>(cdf[s]),
                    static_cast<uint32_t>(cdf[s + 1] - cdf[s]));
        int32_t value = (s == max_value) ? read_symbol_escape(dec, max_value)
                                         : s;
        out[i] = value + offsets[idx];
    }
    state[0] = static_cast<int64_t>(dec.x);
    state[1] = static_cast<int64_t>(dec.ptr - bytes);
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// int16 indexed fast path: symbols AND per-element distribution indexes in
// the device's wire dtype (the hyperprior y-path ships both tensors across
// the host boundary every image — no int32 widening on the 1-core host).
// ---------------------------------------------------------------------------

extern "C" {

int rans_encode_with_indexes_i16(const int16_t* symbols,
                                 const int16_t* indexes, int n,
                                 const int32_t* cdfs, int cdf_stride,
                                 const int32_t* cdf_lengths,
                                 const int32_t* offsets, uint8_t* out,
                                 int out_capacity) {
    std::vector<Op> ops;
    ops.reserve(static_cast<size_t>(n) + 16);
    for (int i = 0; i < n; ++i) {
        const int32_t idx = indexes[i];
        const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
        emit_symbol_ops(ops, cdf, cdf_lengths[idx] - 2,
                        static_cast<int32_t>(symbols[i]) - offsets[idx]);
    }
    RansEncState enc;
    enc.buf.reserve(static_cast<size_t>(n) * 2 + 8);
    for (auto it = ops.rbegin(); it != ops.rend(); ++it)
        enc.put(it->start, it->freq);
    enc.flush();
    const int total = static_cast<int>(enc.buf.size());
    if (total > out_capacity) return -1;
    for (int i = 0; i < total; ++i)
        out[i] = enc.buf[total - 1 - i];
    return total;
}


}  // extern "C"

// ---------------------------------------------------------------------------
// Coarse-LUT decode core: the full 2^16-entry LUT is 128KB per distribution
// and random row hops (cyclic or per-element index orders) thrash L2. A
// 256-entry coarse table (slot >> 8 -> starting symbol) keeps every
// distribution L1-resident; the exact symbol is a short forward scan over
// the (tiny, hot) CDF. One templated core serves all three index sources.
// ---------------------------------------------------------------------------

namespace {

template <typename IndexFn, typename OutT>
inline int coarse_decode_core(const uint8_t* bytes, int n_bytes, int n,
                              const int32_t* cdfs, int cdf_stride,
                              const int32_t* cdf_lengths,
                              const int32_t* offsets, const int16_t* coarse,
                              int coarse_stride, OutT* out, IndexFn idx_of) {
    RansDecState dec;
    dec.init(bytes, n_bytes);
    for (int i = 0; i < n; ++i) {
        const int32_t idx = idx_of(i);
        const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
        const int32_t max_value = cdf_lengths[idx] - 2;
        const uint32_t slot = dec.peek();
        int s = coarse[static_cast<int64_t>(idx) * coarse_stride
                       + (slot >> 8)];
        while (static_cast<uint32_t>(cdf[s + 1]) <= slot) ++s;
        dec.advance(static_cast<uint32_t>(cdf[s]),
                    static_cast<uint32_t>(cdf[s + 1] - cdf[s]));
        int32_t value = (s == max_value)
            ? read_symbol_escape(dec, max_value) : s;
        out[i] = static_cast<OutT>(value + offsets[idx]);
    }
    return 0;
}

}  // namespace

extern "C" {

int rans_decode_cyclic_i16_coarse(const uint8_t* bytes, int n_bytes, int n,
                                  int num_dists, const int32_t* cdfs,
                                  int cdf_stride,
                                  const int32_t* cdf_lengths,
                                  const int32_t* offsets,
                                  const int16_t* coarse, int coarse_stride,
                                  int16_t* out) {
    return coarse_decode_core(
        bytes, n_bytes, n, cdfs, cdf_stride, cdf_lengths, offsets, coarse,
        coarse_stride, out,
        [num_dists](int i) { return static_cast<int32_t>(i % num_dists); });
}

int rans_decode_with_indexes_i16_coarse(const uint8_t* bytes, int n_bytes,
                                        const int16_t* indexes, int n,
                                        const int32_t* cdfs, int cdf_stride,
                                        const int32_t* cdf_lengths,
                                        const int32_t* offsets,
                                        const int16_t* coarse,
                                        int coarse_stride, int16_t* out) {
    return coarse_decode_core(
        bytes, n_bytes, n, cdfs, cdf_stride, cdf_lengths, offsets, coarse,
        coarse_stride, out,
        [indexes](int i) { return static_cast<int32_t>(indexes[i]); });
}

int rans_decode_with_indexes_coarse(const uint8_t* bytes, int n_bytes,
                                    const int32_t* indexes, int n,
                                    const int32_t* cdfs, int cdf_stride,
                                    const int32_t* cdf_lengths,
                                    const int32_t* offsets,
                                    const int16_t* coarse,
                                    int coarse_stride, int32_t* out) {
    return coarse_decode_core(
        bytes, n_bytes, n, cdfs, cdf_stride, cdf_lengths, offsets, coarse,
        coarse_stride, out,
        [indexes](int i) { return indexes[i]; });
}

}  // extern "C"

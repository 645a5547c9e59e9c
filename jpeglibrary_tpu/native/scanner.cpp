// Native entropy-coded-segment scanners for jpeglibrary_tpu.
//
// This is the TPU framework's host-side runtime component: JPEG entropy
// decode is bit-serial and branchy — the one stage that cannot live on
// the TPU — so it runs here as optimized C++, writing dense zig-zag
// coefficient planes that ship straight to the device transform
// kernels.
//
// Semantics mirror the reference decoders exactly (citations into
// /root/reference/src/JpegLibrary):
//  - bit reader with 0xFF-stuffing removal and 1-bit padding past the
//    end of data (JpegBitReader.cs:95-172)
//  - two-level Huffman lookup: 8-bit lookahead + maxcode/valoffset
//    slow path (JpegHuffmanDecodingTable.cs:63-113)
//  - baseline block decode incl. the Min(i, 63) corrupt-stream clamp
//    (JpegHuffmanBaselineScanDecoder.cs:179-223)
//  - restart handling resets DC predictors per segment
//    (JpegHuffmanBaselineScanDecoder.cs:140-163)
//
// Restart segments are decoded in parallel across threads: each RSTn
// segment starts at a known MCU index with fresh predictors, so the
// work partitions with no shared mutable state.
//
// Build: see native/build.py (g++ -O3 -shared, cached by source hash).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Huffman decoding table (fixed-layout blob shared with Python)
// ---------------------------------------------------------------------------

#pragma pack(push, 1)
struct HuffTable {
    uint8_t lookahead_size[256];
    uint8_t lookahead_value[256];
    uint16_t maxcode[18];
    uint8_t valoffset[19];
    uint8_t values[256];
    uint8_t pad[1];  // total 824 bytes
};
#pragma pack(pop)

static_assert(sizeof(HuffTable) == 824, "HuffTable layout drifted from Python packer");

// ---------------------------------------------------------------------------
// Bit reader over one entropy span (raw bytes, unstuffing on the fly)
// ---------------------------------------------------------------------------

struct BitReader {
    const uint8_t* p;
    const uint8_t* end;
    uint64_t bits;     // left-justified bit buffer
    int count;         // valid bits in buffer
    bool exhausted;    // ran past the real data (now serving 1-padding)

    void init(const uint8_t* data, int64_t len) {
        p = data;
        end = data + len;
        bits = 0;
        count = 0;
        exhausted = false;
    }

    // Refill to >= 48 bits, emulating JpegBitReader.FillBuffer
    // (JpegBitReader.cs:95-138): 0xFF00 -> 0xFF, 0xFF-fill runs
    // collapse, end pads with 1-bits (without counting them).
    inline void fill() {
        while (count <= 56) {
            if (p >= end) { exhausted = true; break; }
            uint8_t b = *p;
            if (b != 0xFF) {
                ++p;
            } else {
                const uint8_t* q = p + 1;
                while (q < end && *q == 0xFF) ++q;
                if (q >= end) { p = end; exhausted = true; break; }
                if (*q == 0x00) {
                    p = q + 1;  // deliver the 0xFF literal
                } else {
                    // marker inside span (shouldn't happen: spans are
                    // pre-split) — treat as end of data
                    p = end;
                    exhausted = true;
                    break;
                }
            }
            bits |= (uint64_t)b << (56 - count);
            count += 8;
        }
    }

    // Peek `n` (<=16) bits, 1-padded past the end. Returns the bits and
    // sets `avail` to how many were real.
    inline uint32_t peek(int n, int* avail) {
        if (count < n) fill();
        uint64_t window = bits | (count >= 64 ? 0 : (~0ULL >> (count == 0 ? 0 : count)));
        if (count == 0) window = ~0ULL;
        *avail = count < n ? count : n;
        return (uint32_t)(window >> (64 - n));
    }

    inline void advance(int n) {
        if (n > count) n = count;
        bits <<= n;
        count -= n;
    }

    // Read exactly n bits; returns -1 if not enough real bits remain
    // (TryReadBits failure, JpegBitReader.cs:190-206).
    inline int32_t read(int n) {
        if (n == 0) return 0;
        if (count < n) fill();
        if (count < n) return -1;
        uint32_t v = (uint32_t)(bits >> (64 - n));
        bits <<= n;
        count -= n;
        return (int32_t)v;
    }
};

// Huffman symbol decode: 16-bit peek + two-level lookup
// (JpegHuffmanScanDecoder.DecodeHuffmanCode, JpegHuffmanScanDecoder.cs:81-98
//  and JpegHuffmanDecodingTable.Lookup/LookupSlow).
// Returns symbol value, or -1 on invalid code.
static inline int decode_huffman(BitReader& br, const HuffTable* t) {
    int avail;
    uint32_t code16 = br.peek(16, &avail);
    int size = t->lookahead_size[code16 >> 8];
    int value;
    if (size != 0) {
        value = t->lookahead_value[code16 >> 8];
    } else {
        size = 9;
        while (size <= 16 && code16 > t->maxcode[size]) ++size;
        if (size > 16) return -1;
        uint32_t code = code16 >> (16 - size);
        value = t->values[(uint8_t)(t->valoffset[size] + code)];
    }
    br.advance(size < avail ? size : avail);
    return value;
}

// ITU-T T.81 EXTEND, branchless (JpegHuffmanScanDecoder.cs:100-116).
static inline int32_t extend(int32_t v, int nbits) {
    return v - ((((v + v) >> nbits) - 1) & ((1 << nbits) - 1));
}

// receive_and_extend; *err set on premature end.
static inline int32_t receive_extend(BitReader& br, int nbits, int* err) {
    int32_t v = br.read(nbits);
    if (v < 0) { *err = 1; return 0; }
    return extend(v, nbits);
}

// ---------------------------------------------------------------------------
// Baseline scan
// ---------------------------------------------------------------------------

struct Component {
    int h, v;
    const HuffTable* dc;
    const HuffTable* ac;
    int16_t* plane;    // [Hb, Wb, 64] zig-zag
    int64_t wb;        // plane width in blocks
};

// Decode one 8x8 block (JpegHuffmanBaselineScanDecoder.ReadBlockBaseline).
// Returns 0 ok, 1 bitstream-end, 2 invalid code.
static inline int read_block_baseline(BitReader& br, const Component& c,
                                      int32_t& predictor, int16_t* out) {
    std::memset(out, 0, 64 * sizeof(int16_t));
    int err = 0;
    int t = decode_huffman(br, c.dc);
    if (t < 0) return 2;
    int32_t diff = 0;
    if (t != 0) {
        diff = receive_extend(br, t, &err);
        if (err) return 1;
    }
    predictor += diff;
    out[0] = (int16_t)predictor;

    int i = 1;
    while (i < 64) {
        int s = decode_huffman(br, c.ac);
        if (s < 0) return 2;
        int r = s >> 4;
        s &= 15;
        if (s != 0) {
            i += r;
            int32_t val = receive_extend(br, s, &err);
            if (err) return 1;
            out[i < 63 ? i : 63] = (int16_t)val;
            ++i;
        } else {
            if (r == 0) break;
            i += 16;
        }
    }
    return 0;
}

struct SpanTask {
    const uint8_t* data;
    int64_t len;
    int64_t first_mcu;   // global MCU index this span starts at
    int64_t n_mcus;      // MCUs to decode in this span (may hit end of image)
};

// Decode a run of MCUs from one span with fresh DC predictors.
static int decode_span(const SpanTask& task, Component* comps, int n_comps,
                       int64_t mcus_per_line) {
    BitReader br;
    br.init(task.data, task.len);
    std::vector<int32_t> pred(n_comps, 0);
    int16_t block[64];

    for (int64_t m = 0; m < task.n_mcus; ++m) {
        int64_t mcu = task.first_mcu + m;
        int64_t row = mcu / mcus_per_line;
        int64_t col = mcu % mcus_per_line;
        for (int ci = 0; ci < n_comps; ++ci) {
            Component& c = comps[ci];
            for (int y = 0; y < c.v; ++y) {
                int64_t by = row * c.v + y;
                for (int x = 0; x < c.h; ++x) {
                    int64_t bx = col * c.h + x;
                    int rc = read_block_baseline(br, c, pred[ci], block);
                    if (rc == 2) return 2;
                    if (rc == 1) return 1;
                    std::memcpy(c.plane + (by * c.wb + bx) * 64, block,
                                64 * sizeof(int16_t));
                }
            }
        }
    }
    return 0;
}

}  // namespace

extern "C" {

// Decode one baseline scan. Components are in scan order.
//   span_starts/span_ends: byte ranges of the entropy spans (RSTn-split)
//   restart_interval: MCUs per span (0 = single span)
//   planes: per-component int16 [Hb, Wb, 64] zig-zag coefficient planes
// Returns 0 on success; 1 premature end (tolerated truncation decodes
// partially, matching the reference's exception-free paths is handled
// Python-side); 2 invalid Huffman code; 3 bad arguments.
int jpx_decode_baseline_scan(
    const uint8_t* data,
    const int64_t* span_starts, const int64_t* span_ends, int32_t n_spans,
    int64_t restart_interval,
    int64_t mcus_per_line, int64_t mcus_per_column,
    int32_t n_comps,
    const int32_t* comp_h, const int32_t* comp_v,
    const uint8_t* dc_blob, const uint8_t* ac_blob,  // n_comps HuffTables each
    int16_t** planes, const int64_t* plane_wb,
    int32_t n_threads) {
    if (n_comps <= 0 || n_spans <= 0) return 3;

    std::vector<Component> comps(n_comps);
    for (int i = 0; i < n_comps; ++i) {
        comps[i].h = comp_h[i];
        comps[i].v = comp_v[i];
        comps[i].dc = reinterpret_cast<const HuffTable*>(dc_blob) + i;
        comps[i].ac = reinterpret_cast<const HuffTable*>(ac_blob) + i;
        comps[i].plane = planes[i];
        comps[i].wb = plane_wb[i];
    }

    const int64_t total_mcus = mcus_per_line * mcus_per_column;
    std::vector<SpanTask> tasks;
    if (restart_interval <= 0) {
        SpanTask t{data + span_starts[0], span_ends[0] - span_starts[0], 0, total_mcus};
        tasks.push_back(t);
    } else {
        int64_t mcu = 0;
        for (int32_t s = 0; s < n_spans && mcu < total_mcus; ++s) {
            int64_t n = std::min<int64_t>(restart_interval, total_mcus - mcu);
            SpanTask t{data + span_starts[s], span_ends[s] - span_starts[s], mcu, n};
            tasks.push_back(t);
            mcu += n;
        }
    }

    int hw = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = hw > 0 ? hw : 1;
    n_threads = std::min<int32_t>(n_threads, (int32_t)tasks.size());

    if (n_threads <= 1) {
        for (const auto& t : tasks) {
            int rc = decode_span(t, comps.data(), n_comps, mcus_per_line);
            if (rc) return rc;
        }
        return 0;
    }

    std::vector<int> results(tasks.size(), 0);
    std::vector<std::thread> pool;
    std::vector<std::vector<Component>> comp_copies(n_threads, comps);
    for (int tid = 0; tid < n_threads; ++tid) {
        pool.emplace_back([&, tid]() {
            for (size_t k = tid; k < tasks.size(); k += n_threads) {
                results[k] = decode_span(tasks[k], comp_copies[tid].data(),
                                         n_comps, mcus_per_line);
            }
        });
    }
    for (auto& th : pool) th.join();
    for (int rc : results)
        if (rc) return rc;
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Sparse coefficient packing
// ---------------------------------------------------------------------------
//
// Pack dense zig-zag coefficient planes into (delta uint16, value int16)
// pairs in concatenated-plane flat order. Gaps >= 0xFFFF emit escape
// entries (delta 0xFFFF, value 0): the device reconstructs positions
// with a plain cumulative sum and scatter-adds values (escape values
// add 0). 4 bytes per nonzero instead of 2 bytes per coefficient —
// ~4x fewer host->device bytes at typical quality levels.

extern "C" {

// Returns the number of entries written, or -1 if `capacity` is too
// small. `planes` are int16 plane pointers with `plane_sizes` elements
// each (flattened); output entries go to `out` as interleaved
// (uint16 delta, int16 value).
int64_t jpx_pack_sparse(
    const int16_t** planes, const int64_t* plane_sizes, int32_t n_planes,
    int16_t* out, int64_t capacity) {
    int64_t n = 0;
    int64_t last = -1;   // flat index of the previous emitted value
    int64_t base = 0;
    for (int32_t p = 0; p < n_planes; ++p) {
        const int16_t* plane = planes[p];
        const int64_t size = plane_sizes[p];
        for (int64_t i = 0; i < size; ++i) {
            int16_t v = plane[i];
            if (v == 0) continue;
            int64_t gap = base + i - last;   // >= 1
            while (gap >= 0xFFFF) {
                if (n >= capacity) return -1;
                out[2 * n] = (int16_t)0xFFFF;
                out[2 * n + 1] = 0;
                ++n;
                gap -= 0xFFFF;
            }
            if (n >= capacity) return -1;
            out[2 * n] = (int16_t)(uint16_t)gap;
            out[2 * n + 1] = v;
            ++n;
            last = base + i;
        }
        base += size;
    }
    return n;
}

}  // extern "C"

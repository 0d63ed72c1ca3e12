// Native XDF sample-chunk scanner.
//
// The XDF container interleaves per-stream sample chunks whose payload is a
// per-sample [timestamp-flag byte][optional f64 timestamp][row bytes]
// sequence (spec: https://github.com/sccn/xdf/wiki/Specifications).  For a
// multi-gigabyte lab recording the per-sample walk dominates import time in
// Python (the reference vendors pyxdf and pays the same cost,
// local/xdf.py:357-409); this scanner does the walk at memory bandwidth and
// hands back contiguous timestamp/value arrays.  XML headers, clock sync and
// string streams stay in Python (cold path).
//
// Plain C ABI for ctypes: no dependencies, no exceptions across the
// boundary.  All functions return -1 on malformed input.

#include <cstdint>
#include <cstring>

namespace {

struct Cursor {
    const uint8_t* p;
    const uint8_t* end;
};

// varlen length: [1-byte n][n-byte little-endian unsigned], n in {1,4,8}
static bool read_varlen(Cursor& c, uint64_t& out) {
    if (c.p >= c.end) return false;
    const uint8_t n = *c.p++;
    if (c.p + n > c.end) return false;
    uint64_t v = 0;
    if (n == 1) {
        v = *c.p;
    } else if (n == 4) {
        uint32_t tmp;
        std::memcpy(&tmp, c.p, 4);
        v = tmp;
    } else if (n == 8) {
        std::memcpy(&v, c.p, 8);
    } else {
        return false;
    }
    c.p += n;
    out = v;
    return true;
}

}  // namespace

extern "C" {

// Walk all tag-3 (samples) chunks of stream `sid`.
//
//   buf/len      whole file image (already gunzipped by the caller)
//   sid          stream id
//   row_bytes    n_channels * itemsize for the stream's numeric format
//   tdelta       1/nominal_srate (0 for irregular streams)
//   values_out   (cap * row_bytes) bytes, or NULL to count only
//   ts_out       (cap) doubles, or NULL to count only
//
// Returns the total sample count for the stream (regardless of cap; only
// the first `cap` samples are written), or -1 on malformed input.
long xdf_scan_samples(const uint8_t* buf, uint64_t len, uint32_t sid,
                      uint64_t row_bytes, double tdelta,
                      uint8_t* values_out, double* ts_out, long cap) {
    if (len < 4 || std::memcmp(buf, "XDF:", 4) != 0) return -1;
    Cursor c{buf + 4, buf + len};
    long count = 0;
    // Deduced timestamps are computed as anchor + k*tdelta, re-anchored at
    // every explicit timestamp AND at the first sample of each chunk —
    // bit-identical to the Python parser's vectorized run fill (which would
    // otherwise differ ~1e-12 from sequential accumulation).
    double anchor = 0.0;
    uint64_t k_since = 0;

    while (c.p < c.end) {
        uint64_t chunk_len;
        if (!read_varlen(c, chunk_len)) return -1;
        if (chunk_len < 2 || c.p + chunk_len > c.end) return -1;
        uint16_t tag;
        std::memcpy(&tag, c.p, 2);
        const uint8_t* content = c.p + 2;
        const uint64_t content_len = chunk_len - 2;
        c.p += chunk_len;

        if (tag != 3 || content_len < 4) continue;
        uint32_t chunk_sid;
        std::memcpy(&chunk_sid, content, 4);
        if (chunk_sid != sid) continue;

        Cursor s{content + 4, content + content_len};
        uint64_t n;
        if (!read_varlen(s, n)) return -1;
        for (uint64_t i = 0; i < n; ++i) {
            if (s.p >= s.end) return -1;
            const uint8_t ts_bytes = *s.p++;
            double t;
            if (ts_bytes == 8) {
                if (s.p + 8 > s.end) return -1;
                std::memcpy(&t, s.p, 8);
                s.p += 8;
                anchor = t;
                k_since = 0;
            } else if (ts_bytes == 0) {
                if (i == 0) {  // chunk-first deduced sample re-anchors
                    anchor = anchor + (double)(k_since + 1) * tdelta;
                    k_since = 0;
                } else {
                    ++k_since;
                }
                t = anchor + (double)k_since * tdelta;
            } else {
                return -1;
            }
            if (s.p + row_bytes > s.end) return -1;
            if (count < cap) {
                if (values_out)
                    std::memcpy(values_out + count * row_bytes, s.p, row_bytes);
                if (ts_out) ts_out[count] = t;
            }
            s.p += row_bytes;
            ++count;
        }
    }
    return count;
}

// Enumerate numeric/string stream ids that have at least one sample chunk.
// Fills up to max_ids entries; returns the number of distinct ids seen (may
// exceed max_ids), or -1 on malformed input.
long xdf_scan_stream_ids(const uint8_t* buf, uint64_t len,
                         uint32_t* ids_out, long max_ids) {
    if (len < 4 || std::memcmp(buf, "XDF:", 4) != 0) return -1;
    Cursor c{buf + 4, buf + len};
    long n_ids = 0;
    while (c.p < c.end) {
        uint64_t chunk_len;
        if (!read_varlen(c, chunk_len)) return -1;
        if (chunk_len < 2 || c.p + chunk_len > c.end) return -1;
        uint16_t tag;
        std::memcpy(&tag, c.p, 2);
        const uint8_t* content = c.p + 2;
        c.p += chunk_len;
        if (tag != 3 || chunk_len < 6) continue;
        uint32_t sid;
        std::memcpy(&sid, content, 4);
        bool seen = false;
        for (long k = 0; k < n_ids && k < max_ids; ++k)
            if (ids_out[k] == sid) { seen = true; break; }
        if (!seen) {
            if (n_ids < max_ids) ids_out[n_ids] = sid;
            ++n_ids;
        }
    }
    return n_ids;
}

}  // extern "C"

// mocha_native: host-side hot loops for the motion I/O layer.
//
// The reference is pure Python (SURVEY.md §2.7: zero native components);
// here the two host-side hot paths — decoding the BVH MOTION block's float
// text and formatting frame rows on export — run as native code, loaded via
// ctypes (mocha_sigasia2023_tpu/io/native.py).  Everything device-side is
// JAX/XLA; this deliberately touches only the host data path.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmocha_native.so mocha_native.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// Parse whitespace-separated decimal floats from text[0:len) into out
// (capacity cap).  Returns the number parsed, or -1 on overflow.
// Equivalent of np.array(text.split(), dtype=np.float64) but single-pass
// with no intermediate string list.
int64_t mocha_parse_floats(const char* text, int64_t len, double* out,
                           int64_t cap) {
    const char* p = text;
    const char* end = text + len;
    int64_t n = 0;
    while (p < end) {
        // skip whitespace
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r' || *p == '\f' || *p == '\v')) {
            ++p;
        }
        if (p >= end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) {
            // non-numeric token: skip it
            while (p < end && !(*p == ' ' || *p == '\t' || *p == '\n' ||
                                *p == '\r')) {
                ++p;
            }
            continue;
        }
        if (n >= cap) return -1;
        out[n++] = v;
        p = next;
    }
    return n;
}

// Format an (nrows x ncols) row-major double matrix as "%f"-rows
// ("%f %f ... %f \n", trailing space matching the reference writer,
// motion/bvh.py:210-224).  Returns bytes written, or -1 if cap exceeded.
int64_t mocha_format_frames(const double* vals, int64_t nrows, int64_t ncols,
                            char* out, int64_t cap) {
    int64_t w = 0;
    for (int64_t r = 0; r < nrows; ++r) {
        const double* row = vals + r * ncols;
        for (int64_t c = 0; c < ncols; ++c) {
            if (cap - w < 32) return -1;
            int k = snprintf(out + w, (size_t)(cap - w), "%f ", row[c]);
            if (k < 0) return -1;
            w += k;
        }
        if (w >= cap) return -1;
        out[w++] = '\n';
    }
    return w;
}

// Struct-packed database block helpers: copy with byte-order-safe headers.
// (The numpy codec is already zero-copy on read; these exist so a C++
// consumer can read database.bin without Python.)
int64_t mocha_db_block_f32(const uint8_t* buf, int64_t buflen, int64_t offset,
                           int64_t ncomp, float* out, int64_t cap,
                           int64_t* shape_out /* [2] */) {
    if (offset + 8 > buflen) return -1;
    uint32_t n0, n1;
    memcpy(&n0, buf + offset, 4);
    memcpy(&n1, buf + offset + 4, 4);
    int64_t count = (int64_t)n0 * n1 * ncomp;
    if (offset + 8 + count * 4 > buflen || count > cap) return -1;
    memcpy(out, buf + offset + 8, (size_t)count * 4);
    shape_out[0] = n0;
    shape_out[1] = n1;
    return offset + 8 + count * 4;
}

}  // extern "C"

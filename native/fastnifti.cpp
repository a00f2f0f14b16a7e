// fastnifti: native decode engine for the NIfTI I/O hot path.
//
// The reference delegates this work to nibabel's C internals; this
// framework owns it. Exposed via ctypes (no pybind11 in this image):
//   - fn_gunzip:        zlib inflate of a gzip stream into a caller
//                       buffer (the expected size is known from the
//                       NIfTI header, so no realloc churn).
//   - fn_f2c_transpose: Fortran-order (I fastest) -> C-order (K fastest)
//                       layout transform with cache-blocked loops.
//   - fn_byteswap:      in-place endianness swap for 2/4/8-byte items.
//
// Build: make -C native   (g++ + zlib, both present in the image).

#include <cstdint>
#include <cstring>
#include <zlib.h>

extern "C" {

// Returns the number of bytes written, or a negative zlib error code.
// avail_in/avail_out are 32-bit in zlib, so streams and buffers larger
// than 4 GiB (common for 4D volumes) are fed through <4GiB windows.
long long fn_gunzip(const uint8_t* src, long long src_len,
                    uint8_t* dst, long long dst_cap) {
    z_stream strm;
    std::memset(&strm, 0, sizeof(strm));
    if (inflateInit2(&strm, 16 + MAX_WBITS) != Z_OK) return -100;
    constexpr long long WINDOW = 1LL << 30;  // 1 GiB refill granularity
    long long in_off = 0;
    long long out_off = 0;
    int ret = Z_OK;
    while (ret != Z_STREAM_END) {
        if (strm.avail_in == 0) {
            const long long chunk = src_len - in_off;
            if (chunk <= 0 && ret == Z_OK && out_off > 0) break;  // truncated/concat
            const long long take = chunk < WINDOW ? chunk : WINDOW;
            strm.next_in = const_cast<Bytef*>(src + in_off);
            strm.avail_in = static_cast<uInt>(take > 0 ? take : 0);
            in_off += take > 0 ? take : 0;
        }
        if (strm.avail_out == 0) {
            const long long room = dst_cap - out_off;
            if (room <= 0) { inflateEnd(&strm); return -101; }  // dst too small
            const long long give = room < WINDOW ? room : WINDOW;
            strm.next_out = dst + out_off;
            strm.avail_out = static_cast<uInt>(give);
            out_off += give;
        }
        const long long before = static_cast<long long>(strm.avail_out);
        ret = inflate(&strm, Z_NO_FLUSH);
        if (ret == Z_STREAM_END) break;
        if (ret == Z_BUF_ERROR && strm.avail_in == 0 && in_off >= src_len) {
            break;  // consumed all input without END marker (concat members)
        }
        if (ret != Z_OK) { inflateEnd(&strm); return -ret; }
        (void)before;
    }
    const long long total = out_off - static_cast<long long>(strm.avail_out);
    inflateEnd(&strm);
    return total;
}

}  // extern "C" (reopened below; the template needs C++ linkage)

// F-order (i fastest) (I, J, K) volume -> C-order (k fastest).
// Cache-blocked over (i, k) planes; itemsize-templated dispatch.
template <typename T>
static void f2c_impl(const T* src, T* dst,
                     long long ni, long long nj, long long nk) {
    constexpr long long B = 64;
    for (long long j = 0; j < nj; ++j) {
        const T* splane = src + j * ni;       // stride between k slabs: ni*nj
        T* dplane = dst + j * nk;             // stride between i rows: nj*nk
        for (long long i0 = 0; i0 < ni; i0 += B) {
            const long long imax = i0 + B < ni ? i0 + B : ni;
            for (long long k0 = 0; k0 < nk; k0 += B) {
                const long long kmax = k0 + B < nk ? k0 + B : nk;
                for (long long i = i0; i < imax; ++i) {
                    const T* s = splane + i;
                    T* d = dplane + i * nj * nk;
                    for (long long k = k0; k < kmax; ++k) {
                        d[k] = s[k * ni * nj];
                    }
                }
            }
        }
    }
}

extern "C" int fn_f2c_transpose(const void* src, void* dst,
                     long long ni, long long nj, long long nk,
                     int itemsize) {
    switch (itemsize) {
        case 1: f2c_impl(static_cast<const uint8_t*>(src),
                         static_cast<uint8_t*>(dst), ni, nj, nk); return 0;
        case 2: f2c_impl(static_cast<const uint16_t*>(src),
                         static_cast<uint16_t*>(dst), ni, nj, nk); return 0;
        case 4: f2c_impl(static_cast<const uint32_t*>(src),
                         static_cast<uint32_t*>(dst), ni, nj, nk); return 0;
        case 8: f2c_impl(static_cast<const uint64_t*>(src),
                         static_cast<uint64_t*>(dst), ni, nj, nk); return 0;
        default: return -1;
    }
}

extern "C" int fn_byteswap(void* data, long long count, int itemsize) {
    if (itemsize == 2) {
        auto* p = static_cast<uint16_t*>(data);
        for (long long i = 0; i < count; ++i) p[i] = __builtin_bswap16(p[i]);
    } else if (itemsize == 4) {
        auto* p = static_cast<uint32_t*>(data);
        for (long long i = 0; i < count; ++i) p[i] = __builtin_bswap32(p[i]);
    } else if (itemsize == 8) {
        auto* p = static_cast<uint64_t*>(data);
        for (long long i = 0; i < count; ++i) p[i] = __builtin_bswap64(p[i]);
    } else {
        return -1;
    }
    return 0;
}



// ---------------------------------------------------------------------------
// JPEG Lossless (ITU T.81 process 14) decoder — the DICOM transfer
// syntaxes 1.2.840.10008.1.2.4.57/.70. Single-component scans, any
// predictor 1-7, point transform, restart intervals, byte stuffing.
// The Python fallback in torchio_tpu/io/jpeg_lossless.py implements the
// same algorithm; this runs ~100x faster on clinical 512^2 slices.
// ---------------------------------------------------------------------------

namespace jpegll {

struct BitReader {
    const unsigned char* data;
    long long n;
    long long pos = 0;
    unsigned long long buf = 0;
    int nbits = 0;

    void fill() {
        while (nbits <= 48) {
            unsigned byte = 0;
            if (pos < n) {
                byte = data[pos++];
                if (byte == 0xFF) {
                    unsigned nxt = pos < n ? data[pos] : 0;
                    if (nxt == 0x00) {
                        pos++;  // stuffed zero
                    } else {
                        pos--;  // marker: pad with zeros from here on
                        byte = 0;
                    }
                }
            }
            buf = (buf << 8) | byte;
            nbits += 8;
        }
    }
    unsigned read(int k) {
        if (k == 0) return 0;
        if (nbits < k) fill();
        nbits -= k;
        unsigned v = (unsigned)((buf >> nbits) & ((1ull << k) - 1));
        buf &= (1ull << nbits) - 1;
        return v;
    }
    unsigned peek16() {
        if (nbits < 16) fill();
        return (unsigned)((buf >> (nbits - 16)) & 0xFFFF);
    }
};

static int extend(int value, int ssss) {
    if (ssss == 0) return 0;
    if (ssss == 16) return 32768;
    if (value < (1 << (ssss - 1))) return value - (1 << ssss) + 1;
    return value;
}

}  // namespace jpegll

// Decode header info only (so the caller can size the buffer):
// returns 0 and fills height/width/precision, or negative on error.
extern "C" int fn_jpegll_info(const unsigned char* s, long long n,
                              int* height, int* width, int* precision) {
    if (n < 4 || s[0] != 0xFF || s[1] != 0xD8) return -1;
    long long pos = 2;
    while (pos + 4 <= n) {
        if (s[pos] != 0xFF) return -2;
        unsigned marker = s[pos + 1];
        pos += 2;
        if (marker == 0xD9) break;
        unsigned length = (s[pos] << 8) | s[pos + 1];
        if (marker == 0xC3) {
            *precision = s[pos + 2];
            *height = (s[pos + 3] << 8) | s[pos + 4];
            *width = (s[pos + 5] << 8) | s[pos + 6];
            return 0;
        }
        pos += length;
    }
    return -3;
}

extern "C" int fn_jpegll_decode(const unsigned char* s, long long n,
                                unsigned short* out, long long capacity) {
    if (n < 4 || s[0] != 0xFF || s[1] != 0xD8) return -1;
    long long pos = 2;
    int precision = 0, height = 0, width = 0;
    int predictor = 1, point_transform = 0, restart = 0, table_id = 0;
    long long scan_start = -1;
    // fast Huffman table: 16-bit prefix -> (length << 8) | value
    static thread_local unsigned short fast[1 << 16];
    bool have_table = false;

    while (pos + 4 <= n) {
        if (s[pos] != 0xFF) return -2;
        unsigned marker = s[pos + 1];
        pos += 2;
        if (marker == 0xD9) break;
        unsigned length = (s[pos] << 8) | s[pos + 1];
        const unsigned char* seg = s + pos + 2;
        long long seg_len = (long long)length - 2;
        if (marker == 0xC3) {
            precision = seg[0];
            height = (seg[1] << 8) | seg[2];
            width = (seg[3] << 8) | seg[4];
            if (seg[5] != 1) return -4;  // single component only
        } else if (marker == 0xC4) {
            long long off = 0;
            while (off < seg_len) {
                int id = seg[off] & 0x0F;
                int counts[17];
                int total = 0;
                for (int i = 1; i <= 16; ++i) {
                    counts[i] = seg[off + i];
                    total += counts[i];
                }
                // canonical codes -> 16-bit-prefix lookup table.
                // DICOM lossless streams carry exactly one scan table;
                // the last DHT before SOS wins (id is not tracked).
                (void)id;
                unsigned code = 0;
                long long k = 0;
                for (int lenb = 1; lenb <= 16; ++lenb) {
                    for (int c = 0; c < counts[lenb]; ++c) {
                        unsigned value = seg[off + 17 + k];
                        unsigned prefix = code << (16 - lenb);
                        unsigned span = 1u << (16 - lenb);
                        for (unsigned t = 0; t < span; ++t)
                            fast[prefix | t] = (unsigned short)((lenb << 8) | value);
                        code++;
                        k++;
                    }
                    code <<= 1;
                }
                have_table = true;
                off += 17 + total;
            }
        } else if (marker == 0xDD) {
            restart = (seg[0] << 8) | seg[1];
            // restart-interval streams are rare and need segment
            // splitting; the Python decoder handles them correctly —
            // bail so the caller falls back
            if (restart) return -10;
        } else if (marker == 0xDA) {
            int ns = seg[0];
            if (ns != 1) return -5;
            table_id = seg[2] >> 4;
            (void)table_id;
            predictor = seg[1 + 2 * ns];
            point_transform = seg[3 + 2 * ns] & 0x0F;
            scan_start = pos + length;
            break;
        }
        pos += length;
    }
    if (scan_start < 0 || !have_table || precision == 0) return -6;
    if ((long long)height * width > capacity) return -7;
    if (predictor < 1 || predictor > 7) return -8;

    jpegll::BitReader reader{s + scan_start, n - scan_start};
    const int default_pred = 1 << (precision - point_transform - 1);
    const unsigned mask16 = 0xFFFF;
    for (int r = 0; r < height; ++r) {
        for (int c = 0; c < width; ++c) {
            unsigned key = reader.peek16();
            unsigned entry = fast[key];
            int len = entry >> 8;
            int ssss = entry & 0xFF;
            if (len == 0) return -9;  // invalid code
            reader.read(len);
            int diff = jpegll::extend(
                ssss < 16 ? (int)reader.read(ssss) : 0, ssss);
            int pred;
            if (r == 0 && c == 0) {
                pred = default_pred;
            } else if (r == 0) {
                pred = out[c - 1];
            } else if (c == 0) {
                pred = out[(long long)(r - 1) * width];
            } else {
                int a = out[(long long)r * width + c - 1];
                int b = out[(long long)(r - 1) * width + c];
                int cc = out[(long long)(r - 1) * width + c - 1];
                switch (predictor) {
                    case 1: pred = a; break;
                    case 2: pred = b; break;
                    case 3: pred = cc; break;
                    case 4: pred = a + b - cc; break;
                    case 5: pred = a + ((b - cc) >> 1); break;
                    case 6: pred = b + ((a - cc) >> 1); break;
                    default: pred = (a + b) >> 1; break;
                }
            }
            out[(long long)r * width + c] =
                (unsigned short)(((unsigned)(pred + diff)) & mask16);
        }
    }
    // mask to precision and apply the point transform
    const unsigned pmask = (precision >= 16) ? 0xFFFFu : ((1u << precision) - 1);
    long long total = (long long)height * width;
    for (long long i = 0; i < total; ++i)
        out[i] = (unsigned short)(((unsigned)out[i] & pmask) << point_transform);
    return 0;
}

// ---------------------------------------------------------------------------
// JPEG-LS (ITU T.87 / ISO 14495-1, LOCO-I) decoder — the DICOM transfer
// syntaxes 1.2.840.10008.1.2.4.80/.81. Regular + run modes, LSE preset
// parameters, near-lossless, multi-component interleave mode 0.
// The Python fallback in torchio_tpu/io/jpeg_ls.py implements the same
// algorithm (and the encoder); restart-interval streams bail to it.
// ---------------------------------------------------------------------------

#include <vector>

namespace jls {

static const int J[32] = {0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,  2,  3,  3,  3,  3,
                          4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15};

struct BitReader {
    const unsigned char* data;
    long long n;
    long long pos = 0;
    unsigned long long buf = 0;
    int nbits = 0;
    bool prev_ff = false;
    bool corrupt = false;

    void fill() {
        while (nbits <= 32) {
            if (pos >= n) {
                buf <<= 8;
                nbits += 8;
                continue;
            }
            unsigned b = data[pos];
            if (prev_ff) {
                buf = (buf << 7) | (b & 0x7F);
                nbits += 7;
                prev_ff = false;
                pos++;
                continue;
            }
            if (b == 0xFF) {
                unsigned nxt = pos + 1 < n ? data[pos + 1] : 0xD9;
                if (nxt & 0x80) {  // marker: stop, zero-pad
                    pos = n;
                    continue;
                }
                buf = (buf << 8) | 0xFF;
                nbits += 8;
                prev_ff = true;
                pos++;
                continue;
            }
            buf = (buf << 8) | b;
            nbits += 8;
            pos++;
        }
    }
    unsigned read(int k) {
        if (k == 0) return 0;
        if (nbits < k) fill();
        nbits -= k;
        unsigned v = (unsigned)((buf >> nbits) & ((1ull << k) - 1));
        buf &= (1ull << nbits) - 1;
        return v;
    }
    int read_unary() {
        int count = 0;
        for (;;) {
            if (nbits < 16) fill();
            unsigned window = (unsigned)((buf >> (nbits - 16)) & 0xFFFF);
            if (window == 0) {
                nbits -= 16;
                buf &= (1ull << nbits) - 1;
                count += 16;
                if (count > 4096) { corrupt = true; return 0; }
                continue;
            }
            int lead = __builtin_clz(window) - 16;
            nbits -= lead + 1;
            buf &= (1ull << nbits) - 1;
            return count + lead;
        }
    }
};

struct Params {
    int maxval, near, t1, t2, t3, reset;
    int range, qbpp, bpp, limit;

    void derive() {
        range = (maxval + 2 * near) / (2 * near + 1) + 1;
        qbpp = 0;
        while ((1 << qbpp) < range) qbpp++;
        bpp = 2;
        while ((1 << bpp) <= maxval) bpp++;
        if (bpp < 2) bpp = 2;
        limit = 2 * (bpp + (bpp > 8 ? bpp : 8));
    }
    void default_thresholds() {
        auto clamp1 = [&](int x, int lo) { return (x > maxval || x < lo) ? lo : x; };
        if (maxval >= 128) {
            int f = ((maxval < 4095 ? maxval : 4095) + 128) / 256;
            t1 = clamp1(f + 2 + 3 * near, near + 1);
            t2 = clamp1(4 * f + 3 + 5 * near, t1);
            t3 = clamp1(17 * f + 4 + 7 * near, t2);
        } else {
            int f = 256 / (maxval + 1);
            int v1 = 3 / f + 3 * near; if (v1 < 2) v1 = 2;
            int v2 = 7 / f + 5 * near; if (v2 < 3) v2 = 3;
            int v3 = 21 / f + 7 * near; if (v3 < 4) v3 = 4;
            t1 = clamp1(v1, near + 1);
            t2 = clamp1(v2, t1);
            t3 = clamp1(v3, t2);
        }
    }
};

struct State {
    Params p;
    int A[365], B[365], C[365], N[365];
    int A_run[2], N_run[2], Nn[2];
    int run_index;

    void init(const Params& params) {
        p = params;
        int a_init = (p.range + 32) >> 6;
        if (a_init < 2) a_init = 2;
        for (int i = 0; i < 365; ++i) {
            A[i] = a_init; B[i] = 0; C[i] = 0; N[i] = 1;
        }
        A_run[0] = A_run[1] = a_init;
        N_run[0] = N_run[1] = 1;
        Nn[0] = Nn[1] = 0;
        run_index = 0;
    }
    int quantize(int d) const {
        if (d <= -p.t3) return -4;
        if (d <= -p.t2) return -3;
        if (d <= -p.t1) return -2;
        if (d < -p.near) return -1;
        if (d <= p.near) return 0;
        if (d < p.t1) return 1;
        if (d < p.t2) return 2;
        if (d < p.t3) return 3;
        return 4;
    }
    void update_regular(int q, int errval) {
        B[q] += errval * (2 * p.near + 1);
        A[q] += errval < 0 ? -errval : errval;
        if (N[q] == p.reset) {
            A[q] >>= 1;
            B[q] = B[q] >= 0 ? (B[q] >> 1) : -((1 - B[q]) >> 1);
            N[q] >>= 1;
        }
        N[q] += 1;
        int nv = N[q];
        if (B[q] <= -nv) {
            B[q] += nv;
            if (C[q] > -128) C[q] -= 1;
            if (B[q] <= -nv) B[q] = -nv + 1;
        } else if (B[q] > 0) {
            B[q] -= nv;
            if (C[q] < 127) C[q] += 1;
            if (B[q] > 0) B[q] = 0;
        }
    }
};

static inline int med(int a, int b, int c) {
    int mx = a > b ? a : b, mn = a < b ? a : b;
    if (c >= mx) return mn;
    if (c <= mn) return mx;
    return a + b - c;
}

static inline int clampv(int x, int maxval) {
    return x < 0 ? 0 : (x > maxval ? maxval : x);
}

static inline int reconstruct(int px, int sign_err, const Params& p) {
    int rx = px + sign_err;
    int span = p.range * (2 * p.near + 1);
    if (rx < -p.near) rx += span;
    else if (rx > p.maxval + p.near) rx -= span;
    return clampv(rx, p.maxval);
}

static int decode_limited(BitReader& r, int k, int limit, int qbpp) {
    int u = r.read_unary();
    if (r.corrupt) return -1;
    if (u < limit - qbpp - 1) return (u << k) | (int)r.read(k);
    if (u == limit - qbpp - 1) return (int)r.read(qbpp) + 1;
    r.corrupt = true;
    return -1;
}

static int decode_run_interruption(BitReader& r, State& st,
                                   const int* cur, const int* prev, int col) {
    const Params& p = st.p;
    int a = cur[col];
    int b = prev[col + 1];
    int d = a - b;
    int ritype = (d < 0 ? -d : d) <= p.near ? 1 : 0;
    int px = ritype ? a : b;
    int n = st.N_run[ritype];
    int temp = st.A_run[ritype] + (ritype ? (n >> 1) : 0);
    int k = 0;
    while ((n << k) < temp) k++;
    int limit = p.limit - J[st.run_index] - 1;
    int emap = decode_limited(r, k, limit, p.qbpp);
    if (r.corrupt) return 0;
    int tmp2 = emap + ritype;
    int map_bit = tmp2 & 1;
    int eabs = (tmp2 + map_bit) >> 1;
    int errval;
    if (((k != 0 || 2 * st.Nn[ritype] >= n) ? 1 : 0) == map_bit)
        errval = -eabs;
    else
        errval = eabs;
    if (errval < 0) st.Nn[ritype] += 1;
    st.A_run[ritype] += (emap + 1 - ritype) >> 1;
    if (st.N_run[ritype] == p.reset) {
        st.A_run[ritype] >>= 1;
        st.N_run[ritype] >>= 1;
        st.Nn[ritype] >>= 1;
    }
    st.N_run[ritype] += 1;
    int sign = (ritype == 0 && a > b) ? -1 : 1;
    return reconstruct(px, sign * errval * (2 * p.near + 1), p);
}

// Decode one scan (one component) into out with the given stride
// between samples. Returns 0 or a negative error.
static int decode_scan(BitReader& r, unsigned short* out, long long stride,
                       int width, int height, const Params& params) {
    static thread_local State st;
    st.init(params);
    const Params& p = st.p;
    const int near = p.near;
    std::vector<int> buf_a((size_t)width + 2, 0), buf_b((size_t)width + 2, 0);
    int* prev = buf_a.data();
    int* cur = buf_b.data();
    for (int row = 0; row < height; ++row) {
        int* t = prev; prev = cur; cur = t;
        cur[0] = prev[1];
        prev[width + 1] = prev[width];
        int col = 0;
        while (col < width) {
            int a = cur[col], c = prev[col], b = prev[col + 1], d = prev[col + 2];
            int d1 = d - b, d2 = b - c, d3 = c - a;
            int a1 = d1 < 0 ? -d1 : d1, a2 = d2 < 0 ? -d2 : d2,
                a3 = d3 < 0 ? -d3 : d3;
            if (a1 <= near && a2 <= near && a3 <= near) {
                // run mode
                int runval = cur[col];
                for (;;) {
                    if (r.read(1) == 1) {
                        int seg = 1 << J[st.run_index];
                        int fill = seg < width - col ? seg : width - col;
                        for (int i = col + 1; i <= col + fill; ++i) cur[i] = runval;
                        col += fill;
                        if (fill == seg && st.run_index < 31) st.run_index++;
                        if (col >= width) break;
                    } else {
                        int jbits = J[st.run_index];
                        int cnt = jbits ? (int)r.read(jbits) : 0;
                        if (cnt > width - col - 1) return -20;
                        for (int i = col + 1; i <= col + cnt; ++i) cur[i] = runval;
                        col += cnt;
                        cur[col + 1] = decode_run_interruption(r, st, cur, prev, col);
                        if (st.run_index > 0) st.run_index--;
                        col += 1;
                        break;
                    }
                }
                if (r.corrupt) return -21;
                continue;
            }
            int q1 = st.quantize(d1), q2 = st.quantize(d2), q3 = st.quantize(d3);
            int q = 81 * q1 + 9 * q2 + q3;
            int sign = 1;
            if (q < 0) { sign = -1; q = -q; }
            int px = clampv(med(a, b, c) + sign * st.C[q], p.maxval);
            int av = st.A[q], nv = st.N[q];
            int k = 0;
            while ((nv << k) < av) k++;
            int merr = decode_limited(r, k, p.limit, p.qbpp);
            if (r.corrupt) return -21;
            int errval = (merr & 1) ? -((merr + 1) >> 1) : (merr >> 1);
            if (k == 0 && near == 0 && 2 * st.B[q] <= -st.N[q])
                errval = -errval - 1;
            st.update_regular(q, errval);
            cur[col + 1] = reconstruct(px, sign * errval * (2 * near + 1), p);
            col += 1;
        }
        unsigned short* line = out + (long long)row * width * stride;
        for (int i = 0; i < width; ++i)
            line[(long long)i * stride] = (unsigned short)cur[i + 1];
    }
    return 0;
}

}  // namespace jls

// Header info so the caller can size the buffer: fills height/width/
// ncomp/precision from SOF55, or negative on error.
extern "C" int fn_jls_info(const unsigned char* s, long long n, int* height,
                           int* width, int* ncomp, int* precision) {
    if (n < 4 || s[0] != 0xFF || s[1] != 0xD8) return -1;
    long long pos = 2;
    while (pos + 4 <= n) {
        if (s[pos] != 0xFF) return -2;
        unsigned marker = s[pos + 1];
        pos += 2;
        if (marker == 0xD9) break;
        if (marker >= 0xD0 && marker <= 0xD7) continue;
        unsigned length = ((unsigned)s[pos] << 8) | s[pos + 1];
        if (marker == 0xF7) {
            *precision = s[pos + 2];
            *height = ((int)s[pos + 3] << 8) | s[pos + 4];
            *width = ((int)s[pos + 5] << 8) | s[pos + 6];
            *ncomp = s[pos + 7];
            return 0;
        }
        pos += length;
    }
    return -3;
}

extern "C" int fn_jls_decode(const unsigned char* s, long long n,
                             unsigned short* out, long long capacity) {
    if (n < 4 || s[0] != 0xFF || s[1] != 0xD8) return -1;
    long long pos = 2;
    int precision = 0, height = 0, width = 0, ncomp = 0;
    int maxval = 0, t1 = 0, t2 = 0, t3 = 0, reset = 64;
    bool have_lse = false;
    int decoded = 0;
    while (pos + 2 <= n) {
        if (s[pos] != 0xFF) return -2;
        unsigned marker = s[pos + 1];
        pos += 2;
        if (marker == 0xD9) break;
        if (marker >= 0xD0 && marker <= 0xD7) continue;
        if (pos + 2 > n) return -2;
        unsigned length = ((unsigned)s[pos] << 8) | s[pos + 1];
        const unsigned char* seg = s + pos + 2;
        if (marker == 0xF7) {
            precision = seg[0];
            height = ((int)seg[1] << 8) | seg[2];
            width = ((int)seg[3] << 8) | seg[4];
            ncomp = seg[5];
            maxval = (1 << precision) - 1;
        } else if (marker == 0xF8) {
            if (seg[0] != 1) return -11;  // mapping tables: bail
            int mv = ((int)seg[1] << 8) | seg[2];
            t1 = ((int)seg[3] << 8) | seg[4];
            t2 = ((int)seg[5] << 8) | seg[6];
            t3 = ((int)seg[7] << 8) | seg[8];
            int rs = ((int)seg[9] << 8) | seg[10];
            if (mv) maxval = mv;
            if (rs) reset = rs;
            have_lse = true;
        } else if (marker == 0xDD) {
            int ri = ((int)seg[0] << 8) | seg[1];
            if (ri) return -10;  // restart streams: Python fallback
        } else if (marker == 0xDA) {
            if (precision == 0) return -6;
            int ns = seg[0];
            int near = seg[1 + 2 * ns];
            int ilv = seg[2 + 2 * ns];
            if (ns != 1 || (ilv != 0 && ncomp > 1)) return -5;
            if ((long long)height * width * ncomp > capacity) return -7;
            jls::Params p;
            p.maxval = maxval;
            p.near = near;
            p.reset = reset;
            if (near < 0 || near >= maxval) return -12;
            p.default_thresholds();
            if (have_lse) {
                if (t1) p.t1 = t1;
                if (t2) p.t2 = t2;
                if (t3) p.t3 = t3;
            }
            p.derive();
            jls::BitReader reader{s + pos + length, n - pos - length};
            int rc = jls::decode_scan(
                reader, out + decoded, ncomp, width, height, p);
            if (rc != 0) return rc;
            decoded++;
            if (decoded == ncomp) return 0;
            // skip past the entropy-coded data to the next marker
            long long i = pos + length;
            for (;;) {
                while (i + 1 < n && s[i] != 0xFF) i++;
                if (i + 1 >= n) return -13;
                unsigned nxt = s[i + 1];
                if ((nxt & 0x80) && !(nxt >= 0xD0 && nxt <= 0xD7)) break;
                i++;
            }
            pos = i;
            continue;
        }
        pos += length;
    }
    return decoded == ncomp && decoded > 0 ? 0 : -6;
}

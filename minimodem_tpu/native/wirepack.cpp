// wirepack.cpp — native packer for the lossless delta-bitpack wire.
//
// Byte-identical C++ implementation of ops/wirepack.py's pack(),
// count_exceptions() and the (k, w) chooser's scoring loop.  The wire
// format and its rationale live in the Python module docstring; this
// file exists purely for speed: the e2e PCM16 ingest path is
// link-bound, and the ~25% wire saving of the packed format only pays
// when the host pack runs far faster than the tunnel (the NumPy
// packer measured ~62 MB/s — the same order as the link — so packing
// shifted the bottleneck instead of removing it).  The reference has
// no analogue (it reads from a local device/file,
// src/simpleaudio-sndfile.c); this is TPU-serving transport
// engineering.
//
// Parity contract: for any (x, n_packed, k, w, e_cap),
// mm_wirepack_pack produces the exact bytes of wirepack._pack_py —
// pinned by tests/test_wirepack.py::test_native_pack_byte_parity.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t HEADER_BYTES = 64;
constexpr int MAX_ORDER = 5;
constexpr int WIDTHS[6] = {4, 6, 8, 10, 12, 14};

// k in-place backward first-difference passes over int32 (each pass
// keeps element 0) — identical to wirepack.delta_encode.
void delta_passes(int32_t* a, int64_t n, int k) {
    for (int p = 0; p < k; p++)
        for (int64_t i = n - 1; i >= 1; i--) a[i] -= a[i - 1];
}

// Exception record positions (body indices, including dummy records
// for position gaps > 65535) — identical to wirepack._with_dummies.
void records_with_dummies(const int32_t* body, int64_t n, int w,
                          std::vector<int64_t>& out_pos) {
    out_pos.clear();
    const int32_t lim = int32_t(1) << (w - 1);
    int64_t prev = 0;
    bool first = true;
    for (int64_t i = 0; i < n; i++) {
        int32_t v = body[i];
        if (v < lim && v > -lim) continue;
        // delta measured from the previous OUTPUT record (prepend=0)
        int64_t delta = first ? i : i - prev;
        int64_t n_dum = delta > 0 ? (delta - 1) / 65535 : 0;
        int64_t base = first ? 0 : prev;
        for (int64_t j = 0; j < n_dum; j++)
            out_pos.push_back(base + 65535 * (j + 1));
        out_pos.push_back(i);
        prev = i;
        first = false;
    }
}

}  // namespace

extern "C" {

// Exact exception-record count pack() will emit (incl. dummies).
int64_t mm_wirepack_count(const int16_t* x, int64_t n, int k, int w) {
    if (n <= k) return 0;
    std::vector<int32_t> a(n);
    for (int64_t i = 0; i < n; i++) a[i] = x[i];
    delta_passes(a.data(), n, k);
    const int32_t lim = int32_t(1) << (w - 1);
    bool any = false;
    for (int64_t i = k; i < n && !any; i++)
        any = a[i] >= lim || a[i] <= -lim;
    if (!any) return 0;
    std::vector<int64_t> pos;
    records_with_dummies(a.data() + k, n - k, w, pos);
    return int64_t(pos.size());
}

// (k, w) scoring: for every order k in [0, max_order] and width in
// WIDTHS, bits = 64*8 + w*n + 48*n_exc (n_exc WITHOUT dummies, as in
// choose_params); writes the per-(k, w) n_exc counts so Python can
// replay the exact outer-k/inner-w strict-< argmin.  Counts all
// widths in one pass per k via a bit-length histogram.
void mm_wirepack_scan(const int16_t* x, int64_t n, int max_order,
                      int64_t* n_exc_out /* [(max_order+1) * 6] */) {
    std::vector<int32_t> a(n);
    for (int64_t i = 0; i < n; i++) a[i] = x[i];
    for (int k = 0; k <= max_order; k++) {
        if (k) for (int64_t i = n - 1; i >= 1; i--) a[i] -= a[i - 1];
        // hist[b] = count of |d| with bit-length b (|d| < 2^22 here:
        // |int16 delta| doubles per order, <= 2^16 * 2^5)
        int64_t hist[33] = {0};
        for (int64_t i = k; i < n; i++) {
            uint32_t m = uint32_t(a[i] < 0 ? -int64_t(a[i]) : a[i]);
            hist[m ? 32 - __builtin_clz(m) : 0]++;
        }
        // n_exc(w) = count(|d| >= 2^(w-1)) = count(bitlen >= w)
        int64_t tail[34];
        tail[33] = 0;
        for (int b = 32; b >= 0; b--) tail[b] = tail[b + 1] + hist[b];
        for (int wi = 0; wi < 6; wi++)
            n_exc_out[k * 6 + wi] = tail[WIDTHS[wi]];
    }
}

// Pack x into the wire row (see wirepack.py for the layout).  Returns
// the row length in bytes, or -1 when the exception records exceed
// e_cap (caller falls back to the raw wire), or -2 on a bad argument.
int64_t mm_wirepack_pack(const int16_t* x, int64_t n, int64_t n_packed,
                         int k, int w, int64_t e_cap,
                         uint8_t* out, int64_t out_len) {
    if (w % 2 || w < 2 || w > 16 || k < 0 || k > MAX_ORDER || n <= k)
        return -2;
    const int64_t G0 = (n_packed - k + 7) / 8;
    const int64_t G = G0 > 1 ? G0 : 1;
    // body must fit the 8-lane base planes (the NumPy packer's scatter
    // would raise past this; silently dropping the tail corrupts bytes)
    if (n - k > 8 * G) return -2;
    const int64_t base16 = HEADER_BYTES / 2;
    const int64_t pos16 = base16 + G * (w / 2);
    const int64_t val16 = pos16 + e_cap;
    const int64_t row16 = val16 + 2 * e_cap;
    if (out_len < 2 * row16) return -2;

    std::vector<int32_t> d(n);
    for (int64_t i = 0; i < n; i++) d[i] = x[i];
    delta_passes(d.data(), n, k);
    int32_t* body = d.data() + k;
    const int64_t nb = n - k;

    std::vector<int64_t> rec;
    records_with_dummies(body, nb, w, rec);
    const int64_t n_exc = int64_t(rec.size());
    if (n_exc > e_cap) return -1;

    std::memset(out, 0, size_t(2 * row16));
    uint16_t* o16 = reinterpret_cast<uint16_t*>(out);

    int32_t hdr[12] = {0};
    for (int i = 0; i < k; i++) hdr[i] = d[i];
    hdr[6] = int32_t(n_exc);
    std::memcpy(o16, hdr, sizeof(hdr));

    // exception values are body values AT record positions (dummies
    // carry the in-range value they overwrite — idempotent scatter);
    // record slots then pack as 0 in the base payload
    std::vector<int32_t> vals(n_exc);
    for (int64_t r = 0; r < n_exc; r++) {
        vals[r] = body[rec[r]];
        body[rec[r]] = 0;
    }

    // base planes: group g packs lanes q[j] = body[j*G + g] (zero
    // past nb) little-endian at w bits each; plane h holds bits
    // [16h, 16h+16) of the 8w-bit group
    const uint32_t mask = (uint32_t(1) << w) - 1;
    const int nh = w / 2;
    for (int64_t g = 0; g < G; g++) {
        unsigned __int128 acc = 0;
        for (int j = 0; j < 8; j++) {
            int64_t idx = int64_t(j) * G + g;
            uint32_t vj =
                (idx < nb ? uint32_t(body[idx]) : 0u) & mask;
            acc |= (unsigned __int128)vj << (j * w);
        }
        for (int h = 0; h < nh; h++)
            o16[base16 + h * G + g] =
                uint16_t((acc >> (16 * h)) & 0xFFFF);
    }

    if (n_exc) {
        int64_t prev = 0;
        for (int64_t r = 0; r < n_exc; r++) {
            o16[pos16 + r] = uint16_t(rec[r] - prev);
            prev = rec[r];
            uint32_t v = uint32_t(vals[r]);
            o16[val16 + r] = uint16_t(v & 0xFFFF);
            o16[val16 + e_cap + r] = uint16_t((v >> 16) & 0xFFFF);
        }
    }
    return 2 * row16;
}

}  // extern "C"

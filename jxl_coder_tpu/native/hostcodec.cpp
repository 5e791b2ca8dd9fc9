// Native host codec core: bit reader + prefix-code entropy decode +
// LZ77 + modular channel prediction loop.
//
// This is the TPU-native equivalent of the reference's native runtime
// layer (SURVEY.md §2.5: libjxl's C++ decode loops): byte-level work
// stays on the host but runs at native speed; the Python layer parses
// headers and owns orchestration, the TPU owns pixel math.
//
// Semantics mirror jxl_coder_tpu/{entropy/coder.py, modular/*.py}
// EXACTLY (the Python implementation is the bit-exactness oracle; see
// tests/test_native.py for the cross-check).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 hostcodec.cpp -o libhostcodec.so

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <unordered_map>

extern "C" {

// ---------------------------------------------------------------------
// Bit reader (LSB-first)

struct BitReader {
    const uint8_t* data;
    size_t nbytes;
    size_t pos;  // bit position
    int overrun;
};

static inline uint64_t br_u(BitReader* br, int n) {
    if (n == 0) return 0;
    size_t end = br->pos + (size_t)n;
    if (end > br->nbytes * 8) { br->overrun = 1; return 0; }
    size_t byte0 = br->pos >> 3;
    int shift = (int)(br->pos & 7);
    uint64_t window = 0;
    size_t avail = br->nbytes - byte0;
    int need = (shift + n + 7) / 8;
    for (int i = 0; i < need && (size_t)i < avail && i < 8; i++)
        window |= (uint64_t)br->data[byte0 + i] << (8 * i);
    uint64_t val = (window >> shift) & ((n >= 64) ? ~0ull : ((1ull << n) - 1));
    br->pos = end;
    return val;
}

// ---------------------------------------------------------------------
// Prefix codes: decode via (length, reversed-code) lookup

struct PrefixCode {
    // per length 1..15: map reversed-code -> symbol
    std::unordered_map<uint32_t, int32_t> dec[16];
    int32_t single;  // >= 0 when single-symbol code
};

struct HybridConfig {
    int32_t split_exponent, msb, lsb;
};

struct EntropyCtx {
    BitReader br;
    int32_t num_contexts;
    std::vector<int32_t> cluster_map;  // size num_contexts (+1 if lz77)
    std::vector<PrefixCode> codes;
    std::vector<HybridConfig> configs;
    // lz77
    int32_t lz_enabled, lz_min_symbol, lz_min_length;
    HybridConfig lz_len_config;
    int32_t dist_ctx;
    std::vector<int64_t> window;
    int64_t copy_pos, copy_len, num_decoded;
    int error;  // nonzero on malformed stream
};

static inline int read_symbol(EntropyCtx* ctx, int cluster) {
    PrefixCode& pc = ctx->codes[cluster];
    if (pc.single >= 0) return pc.single;
    uint32_t code = 0;
    for (int ln = 1; ln <= 15; ln++) {
        code |= (uint32_t)br_u(&ctx->br, 1) << (ln - 1);
        auto it = pc.dec[ln].find(code);
        if (it != pc.dec[ln].end()) return it->second;
    }
    ctx->error = 1;
    return 0;
}

static inline int64_t read_uint_cfg(EntropyCtx* ctx, const HybridConfig& c,
                                    int64_t token) {
    int64_t split = 1ll << c.split_exponent;
    if (token < split) return token;
    int msb = c.msb, lsb = c.lsb;
    int64_t n = c.split_exponent - (msb + lsb)
        + ((token - split) >> (msb + lsb));
    if (n >= 32) { ctx->error = 2; return 0; }
    int64_t low = token & ((1ll << lsb) - 1);
    token >>= lsb;
    int64_t msbits = (token & ((1ll << msb) - 1)) | (1ll << msb);
    return ((((msbits << n) | (int64_t)br_u(&ctx->br, (int)n)) << lsb)
            | low);
}

static int64_t entropy_read(EntropyCtx* ctx, int context) {
    if (!ctx->lz_enabled) {
        int cluster = ctx->cluster_map[context];
        int64_t token = read_symbol(ctx, cluster);
        return read_uint_cfg(ctx, ctx->configs[cluster], token);
    }
    if (ctx->copy_len > 0) {
        ctx->copy_len--;
        int64_t v = ctx->window[ctx->copy_pos++];
        ctx->window.push_back(v);
        ctx->num_decoded++;
        return v;
    }
    int cluster = ctx->cluster_map[context];
    int64_t token = read_symbol(ctx, cluster);
    if (token >= ctx->lz_min_symbol) {
        int64_t length = ctx->lz_min_length
            + read_uint_cfg(ctx, ctx->lz_len_config,
                            token - ctx->lz_min_symbol);
        int dcl = ctx->cluster_map[ctx->dist_ctx];
        int64_t dtok = read_symbol(ctx, dcl);
        int64_t dval = read_uint_cfg(ctx, ctx->configs[dcl], dtok);
        int64_t distance = dval + 1;  // dist_multiplier == 0 path
        if (distance > ctx->num_decoded) distance = ctx->num_decoded;
        if (distance > (1 << 20)) distance = 1 << 20;
        if (distance <= 0) { ctx->error = 3; return 0; }
        ctx->copy_pos = ctx->num_decoded - distance;
        ctx->copy_len = length - 1;
        int64_t v = ctx->window[ctx->copy_pos++];
        ctx->window.push_back(v);
        ctx->num_decoded++;
        return v;
    }
    int64_t v = read_uint_cfg(ctx, ctx->configs[cluster], token);
    ctx->window.push_back(v);
    ctx->num_decoded++;
    return v;
}

// ---------------------------------------------------------------------
// Public entropy API

// code_lengths_flat: concatenated per-cluster length arrays;
// code_offsets[i]..code_offsets[i+1] delimit cluster i's alphabet.
EntropyCtx* entropy_new(const uint8_t* data, size_t nbytes, size_t bit_pos,
                        int32_t num_contexts,
                        const int32_t* cluster_map, int32_t map_len,
                        int32_t num_clusters,
                        const int32_t* code_lengths_flat,
                        const int32_t* code_offsets,
                        const int32_t* configs_flat,  // 3 per cluster
                        const int32_t* lz77_params    // [enabled, min_sym,
                                                      //  min_len, se, msb,
                                                      //  lsb]
                        ) {
    EntropyCtx* ctx = new EntropyCtx();
    ctx->br.data = data;
    ctx->br.nbytes = nbytes;
    ctx->br.pos = bit_pos;
    ctx->br.overrun = 0;
    ctx->num_contexts = num_contexts;
    ctx->cluster_map.assign(cluster_map, cluster_map + map_len);
    ctx->error = 0;
    ctx->copy_pos = ctx->copy_len = ctx->num_decoded = 0;
    ctx->lz_enabled = lz77_params[0];
    ctx->lz_min_symbol = lz77_params[1];
    ctx->lz_min_length = lz77_params[2];
    ctx->lz_len_config = {lz77_params[3], lz77_params[4], lz77_params[5]};
    ctx->dist_ctx = num_contexts;
    ctx->codes.resize(num_clusters);
    ctx->configs.resize(num_clusters);
    for (int cl = 0; cl < num_clusters; cl++) {
        ctx->configs[cl] = {configs_flat[3 * cl], configs_flat[3 * cl + 1],
                            configs_flat[3 * cl + 2]};
        int lo = code_offsets[cl], hi = code_offsets[cl + 1];
        PrefixCode& pc = ctx->codes[cl];
        pc.single = -1;
        int nz = 0, last = -1;
        for (int s = lo; s < hi; s++)
            if (code_lengths_flat[s] > 0) { nz++; last = s - lo; }
        if (nz <= 1) { pc.single = last < 0 ? 0 : last; continue; }
        // canonical code assignment identical to prefix.py
        int alpha = hi - lo;
        int max_len = 0;
        for (int s = 0; s < alpha; s++)
            if (code_lengths_flat[lo + s] > max_len)
                max_len = code_lengths_flat[lo + s];
        std::vector<int> bl_count(max_len + 1, 0);
        for (int s = 0; s < alpha; s++)
            if (code_lengths_flat[lo + s])
                bl_count[code_lengths_flat[lo + s]]++;
        std::vector<uint32_t> next_code(max_len + 2, 0);
        uint32_t code = 0;
        for (int ln = 1; ln <= max_len; ln++) {
            code = (code + bl_count[ln - 1]) << 1;
            next_code[ln] = code;
        }
        for (int s = 0; s < alpha; s++) {
            int ln = code_lengths_flat[lo + s];
            if (!ln) continue;
            uint32_t c = next_code[ln]++;
            // reverse bits
            uint32_t r = 0;
            for (int b = 0; b < ln; b++) { r = (r << 1) | (c & 1); c >>= 1; }
            pc.dec[ln][r] = s;
        }
    }
    return ctx;
}

int64_t entropy_read_one(EntropyCtx* ctx, int32_t context) {
    return entropy_read(ctx, context);
}

void entropy_read_many(EntropyCtx* ctx, int32_t context, int64_t n,
                       int64_t* out) {
    for (int64_t i = 0; i < n; i++) out[i] = entropy_read(ctx, context);
}

size_t entropy_bit_pos(EntropyCtx* ctx) { return ctx->br.pos; }
int entropy_error(EntropyCtx* ctx) {
    return ctx->error | (ctx->br.overrun ? 16 : 0);
}
void entropy_free(EntropyCtx* ctx) { delete ctx; }

// ---------------------------------------------------------------------
// Modular channel decode

static inline int64_t floordiv(int64_t a, int64_t b) {
    int64_t q = a / b, r = a % b;
    return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}

static inline int64_t unpack_signed(int64_t u) {
    return (u & 1) ? -((u + 1) >> 1) : (u >> 1);
}

static inline int64_t clamped_gradient(int64_t N, int64_t W, int64_t NW) {
    int64_t m = N < W ? N : W;
    int64_t M = N > W ? N : W;
    int64_t grad = N + W - NW;
    if (NW > M) return m;
    if (NW < m) return M;
    return grad;
}

struct WPStateC {
    int64_t p1, p2, p3a, p3b, p3c, p3d, p3e, w[4];
    std::vector<int64_t> pred_errors[4], pred_errors_prev[4];
    std::vector<int64_t> error, error_prev;
    int64_t pred, max_error, subpred[4];
    int width;
    void init(const int32_t* params, int w_) {
        p1 = params[0]; p2 = params[1]; p3a = params[2]; p3b = params[3];
        p3c = params[4]; p3d = params[5]; p3e = params[6];
        w[0] = params[7]; w[1] = params[8]; w[2] = params[9];
        w[3] = params[10];
        width = w_;
        for (int k = 0; k < 4; k++) {
            pred_errors[k].assign(w_ + 2, 0);
            pred_errors_prev[k].assign(w_ + 2, 0);
        }
        error.assign(w_ + 2, 0);
        error_prev.assign(w_ + 2, 0);
        pred = max_error = 0;
    }
    void new_row() {
        for (int k = 0; k < 4; k++) {
            std::swap(pred_errors[k], pred_errors_prev[k]);
            std::fill(pred_errors[k].begin(), pred_errors[k].end(), 0);
        }
        std::swap(error, error_prev);
        std::fill(error.begin(), error.end(), 0);
    }
    static int floor_log2(int64_t v) {
        int r = -1;
        while (v) { v >>= 1; r++; }
        return r;
    }
    int64_t predict(int x, int y, int w_, int64_t W, int64_t N, int64_t NW,
                    int64_t NE, int64_t NN) {
        int64_t W3 = W << 3, N3 = N << 3, NW3 = NW << 3, NE3 = NE << 3,
                NN3 = NN << 3;
        int xp = x + 1;
        int64_t err_W = x > 0 ? error[xp - 1] : 0;
        int64_t err_N = y > 0 ? error_prev[xp] : 0;
        int64_t err_NW = (x > 0 && y > 0) ? error_prev[xp - 1] : err_N;
        int64_t err_NE = (x + 1 < w_ && y > 0) ? error_prev[xp + 1] : err_N;
        subpred[0] = W3 + NE3 - N3;
        subpred[1] = N3 - (((err_W + err_N + err_NE) * p1) >> 5);
        subpred[2] = W3 - (((err_W + err_N + err_NW) * p2) >> 5);
        subpred[3] = N3 - ((err_NW * p3a + err_N * p3b + err_NE * p3c
                            + (NN3 - N3) * p3d + (NW3 - W3) * p3e) >> 5);
        int64_t wts[4], swt = 0;
        for (int k = 0; k < 4; k++) {
            int64_t esum = pred_errors_prev[k][xp]
                + pred_errors_prev[k][xp - 1]
                + pred_errors_prev[k][xp + 1]
                + (x > 0 ? pred_errors[k][xp - 1] : 0);
            int shift = floor_log2(esum + 1) - 5;
            if (shift < 0) shift = 0;
            int64_t weight = 4 + ((w[k] * ((1ll << 24)
                                           / ((esum >> shift) + 1)))
                                  >> shift);
            wts[k] = weight;
            swt += weight;
        }
        int64_t s = (swt >> 1) - 1;
        for (int k = 0; k < 4; k++) s += subpred[k] * wts[k];
        int64_t p = swt ? floordiv(s * 2 + 1, swt * 2) : subpred[0];
        if (((err_N ^ err_W) | (err_N ^ err_NW)) <= 0) {
            int64_t lo = W3 < N3 ? W3 : N3;
            if (NE3 < lo) lo = NE3;
            int64_t hi = W3 > N3 ? W3 : N3;
            if (NE3 > hi) hi = NE3;
            if (p < lo) p = lo;
            if (p > hi) p = hi;
        }
        pred = p;
        int64_t a1 = err_W < 0 ? -err_W : err_W;
        int64_t a2 = err_N < 0 ? -err_N : err_N;
        int64_t a3 = err_NW < 0 ? -err_NW : err_NW;
        int64_t a4 = err_NE < 0 ? -err_NE : err_NE;
        max_error = a1;
        if (a2 > max_error) max_error = a2;
        if (a3 > max_error) max_error = a3;
        if (a4 > max_error) max_error = a4;
        return p;
    }
    void update(int x, int64_t value) {
        int xp = x + 1;
        int64_t v3 = value << 3;
        error[xp] = v3 - pred;
        for (int k = 0; k < 4; k++) {
            int64_t e = subpred[k] - v3;
            if (e < 0) e = -e;
            e = (e + 3) >> 3;
            pred_errors[k][xp] += e;
        }
    }
};

static inline int64_t predict_one(int p, int64_t W, int64_t N, int64_t NW,
                                  int64_t NE, int64_t NN, int64_t WW,
                                  int64_t NEE, int64_t wp_pred3,
                                  int* err) {
    switch (p) {
        case 0: return 0;
        case 1: return W;
        case 2: return N;
        case 3: return (W + N) / 2;  // trunc toward zero, per reference
        case 4: {
            int64_t g = W + N - NW;
            int64_t dW = g - W; if (dW < 0) dW = -dW;
            int64_t dN = g - N; if (dN < 0) dN = -dN;
            return dW < dN ? W : N;  // ties go to N
        }
        case 5: return clamped_gradient(N, W, NW);
        case 6: return (wp_pred3 + 3) >> 3;
        case 7: return NE;
        case 8: return NW;
        case 9: return WW;
        case 10: return (W + NW) / 2;
        case 11: return (NW + N) / 2;
        case 12: return (N + NE) / 2;
        case 13: return (6 * N - 2 * NN + 7 * W + WW + NEE + 3 * NE + 8)
                     / 16;
    }
    *err = 1;
    return 0;
}

// tree_flat: 7 int32 per node:
//   [property, splitval, left, right, predictor, offset, multiplier]
//   leaf ctx = node index order of leaves (precomputed on Python side
//   as the 8th column)
// Actually 8 columns with ctx last.
int decode_channel_native(
    EntropyCtx* ctx,
    const int32_t* tree_flat, int32_t n_nodes,
    int32_t* out, int32_t w, int32_t h,
    int32_t chan_index, int32_t stream_id,
    const int32_t* wp_params,  // 11 ints
    const int64_t** prev_planes, int32_t n_prev,
    int32_t use_wp, int32_t max_prop) {

    const int COLS = 8;
    WPStateC wp;
    if (use_wp) wp.init(wp_params, w);
    int errflag = 0;

    std::vector<int64_t> row_props;
    for (int y = 0; y < h; y++) {
        if (use_wp && y > 0) wp.new_row();
        for (int x = 0; x < w; x++) {
            // neighbors (same edge rules as predict.neighbors)
            int64_t W = x > 0 ? out[y * w + x - 1]
                       : (y > 0 ? out[(y - 1) * w + x] : 0);
            int64_t N = y > 0 ? out[(y - 1) * w + x] : W;
            int64_t NW = (x > 0 && y > 0) ? out[(y - 1) * w + x - 1] : W;
            int64_t NE = (x + 1 < w && y > 0) ? out[(y - 1) * w + x + 1]
                                              : N;
            int64_t NN = y > 1 ? out[(y - 2) * w + x] : N;
            int64_t WW = x > 1 ? out[y * w + x - 2] : W;
            int64_t NEE = (x + 2 < w && y > 0) ? out[(y - 1) * w + x + 2]
                                               : NE;
            int64_t wp_pred3 = 0, max_err = 0;
            if (use_wp) {
                wp_pred3 = wp.predict(x, y, w, W, N, NW, NE, NN);
                max_err = wp.max_error;
            }
            // tree lookup
            int node = 0;
            if (max_prop >= 0) {
                while (tree_flat[node * COLS + 0] >= 0) {
                    int prop = tree_flat[node * COLS + 0];
                    int64_t v;
                    switch (prop) {
                        case 0: v = chan_index; break;
                        case 1: v = stream_id; break;
                        case 2: v = y; break;
                        case 3: v = x; break;
                        case 4: v = N < 0 ? -N : N; break;
                        case 5: v = W < 0 ? -W : W; break;
                        case 6: v = N; break;
                        case 7: v = W; break;
                        case 8: v = W + N - NW; break;
                        case 9: v = W - NW; break;
                        case 10: v = NW - N; break;
                        case 11: v = N - NE; break;
                        case 12: v = N - NN; break;
                        case 13: v = W - WW; break;
                        case 14: v = max_err; break;
                        case 15: v = 0; break;
                        default: {
                            int pi = (prop - 16) >> 1;
                            if (pi < n_prev) {
                                int64_t pv = prev_planes[pi][y * w + x];
                                v = ((prop - 16) & 1)
                                    ? pv : (pv < 0 ? -pv : pv);
                            } else v = 0;
                            break;
                        }
                    }
                    node = (v > tree_flat[node * COLS + 1])
                        ? tree_flat[node * COLS + 2]
                        : tree_flat[node * COLS + 3];
                }
            }
            int predictor = tree_flat[node * COLS + 4];
            int64_t offset = tree_flat[node * COLS + 5];
            int64_t multiplier = tree_flat[node * COLS + 6];
            int leaf_ctx = tree_flat[node * COLS + 7];
            int64_t pred = predict_one(predictor, W, N, NW, NE, NN, WW,
                                       NEE, wp_pred3, &errflag);
            int64_t residual = entropy_read(ctx, leaf_ctx);
            int64_t val = pred + offset
                + multiplier * unpack_signed(residual);
            out[y * w + x] = (int32_t)val;
            if (use_wp) wp.update(x, val);
        }
    }
    return errflag | ctx->error | (ctx->br.overrun ? 16 : 0);
}

}  // extern "C"

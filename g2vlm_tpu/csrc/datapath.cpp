// Native data-path kernels for the host-side pipeline.
//
// The reference leans on external native wheels (decord, open3d, cv2) for its
// host work; here the hot host ops are in-tree C++ behind ctypes:
//   * build_sequence_metadata — one-pass construction of the packed-sequence
//     TokenInfo/rope/scatter-index arrays (the Python builder in
//     models/g2vlm.py is the fallback; this is the production path for
//     36k-token packs)
//   * depth_unproject — pinhole depth -> world points + validity mask
//   * resize_bilinear_f32 — antialias-free bilinear resize (align_corners
//     False, matching torch) for depth/feature maps
//
// Build: g++ -O3 -march=native -shared -fPIC datapath.cpp -o libdatapath.so

#include <cstdint>
#include <cmath>
#include <algorithm>

extern "C" {

// Segment descriptor: {type, a, b, c}
//   type 0 = text:   a = num tokens
//   type 1 = dino:   a = hp, b = wp            (framed with soi/eoi)
//   type 2 = vit:    a = t, b = hm, c = wm     (merged grid, framed)
// Attention split ids: text = -1 (causal); dino segments of one sample share
// `dino_fn`; each vit segment gets a fresh id.
struct Seg { int32_t type, a, b, c; };

int64_t build_sequence_metadata(
    const int32_t* segs, int64_t n_segs,
    int32_t doc, int32_t rope_start, int64_t curr_start,
    int32_t fn_start, int32_t dino_fn,
    int32_t soi, int32_t eoi,
    // outputs (caller-allocated, sized for the full pack)
    int32_t* doc_id, int32_t* fn_id, int32_t* noise_id, int32_t* pos_meta,
    int64_t* position_ids,       // (3, S) flattened row-major rows
    uint8_t* is_geo,
    int32_t* text_ids, int64_t* text_indexes, int64_t* n_text_io,
    int64_t* dino_indexes, int64_t* n_dino_io,
    int64_t* vit_indexes, int64_t* n_vit_io,
    int64_t stride /* row stride of position_ids == total S */)
{
    int64_t curr = curr_start;
    int64_t rope = rope_start;
    int64_t nt = *n_text_io, nd = *n_dino_io, nv = *n_vit_io;
    int32_t next_fn = fn_start;

    auto emit = [&](int64_t n, int32_t fn, bool geo) {
        for (int64_t i = 0; i < n; ++i) {
            doc_id[curr + i] = doc;
            fn_id[curr + i] = fn;
            noise_id[curr + i] = -1;
            pos_meta[curr + i] = (int32_t)(curr + i);
            is_geo[curr + i] = geo ? 1 : 0;
        }
    };
    auto set_pos = [&](int64_t at, int64_t t, int64_t h, int64_t w) {
        position_ids[0 * stride + at] = t;
        position_ids[1 * stride + at] = h;
        position_ids[2 * stride + at] = w;
    };
    auto text_token = [&](int32_t tok, int32_t fn) {
        text_ids[nt] = tok;
        text_indexes[nt] = curr;
        ++nt;
        emit(1, fn, false);
        set_pos(curr, rope, rope, rope);
        ++curr;
        ++rope;
    };

    for (int64_t s = 0; s < n_segs; ++s) {
        const Seg& g = *reinterpret_cast<const Seg*>(segs + 4 * s);
        if (g.type == 0) {
            // token ids are filled by the caller (slots marked -1)
            for (int32_t i = 0; i < g.a; ++i) {
                text_ids[nt] = -1;
                text_indexes[nt] = curr;
                ++nt;
                emit(1, -1, false);
                set_pos(curr, rope, rope, rope);
                ++curr;
                ++rope;
            }
        } else if (g.type == 1) {  // dino view
            int64_t hp = g.a, wp = g.b, hw = hp * wp;
            text_token(soi, dino_fn);
            for (int64_t i = 0; i < hw; ++i) {
                int64_t at = curr + i;
                dino_indexes[nd++] = at;
                set_pos(at, rope, rope + i / wp, rope + i % wp);
            }
            emit(hw, dino_fn, true);
            curr += hw;
            rope += std::max(hp, wp) - 1 + 1;
            text_token(eoi, dino_fn);
        } else {  // vit view
            int32_t fn = next_fn++;
            int64_t t = g.a, hm = g.b, wm = g.c, hw = t * hm * wm;
            text_token(soi, fn);
            for (int64_t i = 0; i < hw; ++i) {
                int64_t at = curr + i;
                vit_indexes[nv++] = at;
                int64_t ti = i / (hm * wm), rem = i % (hm * wm);
                set_pos(at, rope + ti, rope + rem / wm, rope + rem % wm);
            }
            emit(hw, fn, false);
            curr += hw;
            int64_t mx = std::max({t, hm, wm});
            rope += mx - 1 + 1;
            text_token(eoi, fn);
        }
    }
    *n_text_io = nt;
    *n_dino_io = nd;
    *n_vit_io = nv;
    // encode final cursors: curr in low 32 bits semantics are fine as return
    return (rope << 32) | (curr & 0xffffffffLL);
}

void depth_unproject(
    const float* depth, int64_t h, int64_t w,
    const float* intrinsics /* 3x3 row-major */,
    const float* cam2world /* 4x4 row-major */,
    float* world_points /* (h, w, 3) */, uint8_t* valid /* (h, w) */)
{
    const float fx = intrinsics[0], cx = intrinsics[2];
    const float fy = intrinsics[4], cy = intrinsics[5];
    const float* R = cam2world;
    for (int64_t v = 0; v < h; ++v) {
        for (int64_t u = 0; u < w; ++u) {
            float d = depth[v * w + u];
            float x = ((float)u - cx) * d / fx;
            float y = ((float)v - cy) * d / fy;
            float wx = R[0] * x + R[1] * y + R[2] * d + R[3];
            float wy = R[4] * x + R[5] * y + R[6] * d + R[7];
            float wz = R[8] * x + R[9] * y + R[10] * d + R[11];
            float* out = world_points + (v * w + u) * 3;
            out[0] = wx; out[1] = wy; out[2] = wz;
            valid[v * w + u] = (std::isfinite(d) && d > 0.f) ? 1 : 0;
        }
    }
}

void resize_bilinear_f32(
    const float* src, int64_t sh, int64_t sw,
    float* dst, int64_t dh, int64_t dw)
{
    const float scale_y = (float)sh / dh, scale_x = (float)sw / dw;
    for (int64_t y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * scale_y - 0.5f;
        int64_t y0 = (int64_t)std::floor(fy);
        float wy = fy - y0;
        int64_t y0c = std::clamp(y0, (int64_t)0, sh - 1);
        int64_t y1c = std::clamp(y0 + 1, (int64_t)0, sh - 1);
        for (int64_t x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * scale_x - 0.5f;
            int64_t x0 = (int64_t)std::floor(fx);
            float wx = fx - x0;
            int64_t x0c = std::clamp(x0, (int64_t)0, sw - 1);
            int64_t x1c = std::clamp(x0 + 1, (int64_t)0, sw - 1);
            float a = src[y0c * sw + x0c], b = src[y0c * sw + x1c];
            float c = src[y1c * sw + x0c], d = src[y1c * sw + x1c];
            dst[y * dw + x] =
                (a * (1 - wx) + b * wx) * (1 - wy) +
                (c * (1 - wx) + d * wx) * wy;
        }
    }
}

}  // extern "C"

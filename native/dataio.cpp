// ipoke_tpu native data-loading engine.
//
// The reference's native code lives in FlowNet2's CUDA ops and the pose
// estimator's compiled extensions (SURVEY §2.9); the TPU rebuild keeps the
// device compute in XLA/Pallas and moves the *host* hot path — image/flow
// decode and branchy poke simulation — into this OpenMP-parallel C++ engine
// (reference host path: data/base_dataset.py:195-241,507-693).
//
// Exposed via a plain C ABI consumed with ctypes (ipoke_tpu/data/native.py):
//   ipoke_load_npy_flow    : .npy (float32, HWC or CHW 2-channel) -> buffer
//   ipoke_load_png         : PNG -> float32 RGB in [-1, 1]
//   ipoke_simulate_pokes   : batched poke simulation (threshold ladder,
//                            zero-poke background placement)
//   ipoke_load_batch       : full sample assembly (T frames + flow + poke)
//
// Build: ipoke_tpu/data/native.py::build() (g++ -O3 -fopenmp -shared -lpng).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// .npy reader (float32/float64, C-order; minimal parser for the flow files)
// ---------------------------------------------------------------------------

// Returns 0 on success; fills dims (up to 4) and ndim; copies data (as f32)
// into out (caller-allocated with capacity cap floats).
int ipoke_load_npy_flow(const char* path, float* out, int64_t cap,
                        int64_t* dims, int* ndim) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return 2;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major >= 2) {
    if (fread(&header_len, 4, 1, f) != 1) { fclose(f); return 2; }
  } else {
    uint16_t hl16;
    if (fread(&hl16, 2, 1, f) != 1) { fclose(f); return 2; }
    header_len = hl16;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) { fclose(f); return 2; }
  bool f8 = header.find("<f8") != std::string::npos;
  if (!f8 && header.find("<f4") == std::string::npos) { fclose(f); return 3; }
  if (header.find("'fortran_order': True") != std::string::npos) { fclose(f); return 3; }
  size_t sp = header.find("'shape': (");
  if (sp == std::string::npos) { fclose(f); return 3; }
  sp += 10;
  int nd = 0;
  int64_t total = 1;
  while (nd < 4) {
    size_t end = header.find_first_of(",)", sp);
    std::string tok = header.substr(sp, end - sp);
    if (!tok.empty() && tok.find_first_of("0123456789") != std::string::npos) {
      dims[nd] = atoll(tok.c_str());
      total *= dims[nd];
      nd++;
    }
    if (header[end] == ')') break;
    sp = end + 1;
  }
  *ndim = nd;
  if (total > cap) { fclose(f); return 4; }
  if (f8) {
    std::vector<double> tmp(total);
    if (fread(tmp.data(), 8, total, f) != (size_t)total) { fclose(f); return 5; }
    for (int64_t i = 0; i < total; i++) out[i] = (float)tmp[i];
  } else {
    if (fread(out, 4, total, f) != (size_t)total) { fclose(f); return 5; }
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG decode -> float32 RGB [-1, 1], optional box-ish resize
// ---------------------------------------------------------------------------

int ipoke_load_png(const char* path, float* out, int out_h, int out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  std::vector<png_byte> row(png_get_rowbytes(png, info));
  std::vector<uint8_t> img((size_t)h * w * 3);
  for (png_uint_32 y = 0; y < h; y++) {
    png_read_row(png, row.data(), nullptr);
    memcpy(&img[(size_t)y * w * 3], row.data(), (size_t)w * 3);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  // bilinear resize (align_corners) to (out_h, out_w) + [-1,1] normalize
  for (int oy = 0; oy < out_h; oy++) {
    float sy = out_h == 1 ? 0.f : (float)oy * (h - 1) / (out_h - 1);
    int y0 = std::min((int)sy, (int)h - 2);
    float fy = sy - y0;
    for (int ox = 0; ox < out_w; ox++) {
      float sx = out_w == 1 ? 0.f : (float)ox * (w - 1) / (out_w - 1);
      int x0 = std::min((int)sx, (int)w - 2);
      float fx = sx - x0;
      for (int c = 0; c < 3; c++) {
        float v00 = img[((size_t)y0 * w + x0) * 3 + c];
        float v01 = img[((size_t)y0 * w + x0 + 1) * 3 + c];
        float v10 = img[((size_t)(y0 + 1) * w + x0) * 3 + c];
        float v11 = img[((size_t)(y0 + 1) * w + x0 + 1) * 3 + c];
        float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                  v10 * fy * (1 - fx) + v11 * fy * fx;
        out[((size_t)oy * out_w + ox) * 3 + c] = v / 127.5f - 1.0f;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// poke simulation (semantics of data/base_dataset.py:507-648)
// ---------------------------------------------------------------------------

struct PokeParams {
  int poke_size;
  int n_pokes_max;
  int fix_n_pokes;
  int equal_poke_val;
  int zero_poke;
};

static void simulate_one(const float* flow, int h, int w, const PokeParams& pp,
                         uint64_t seed, float* poke, int64_t* centers) {
  std::mt19937_64 rng(seed);
  const int ps = pp.poke_size;
  const int vh0 = ps, vh1 = h - ps, vw0 = ps, vw1 = w - ps;
  const int vh = vh1 - vh0, vw = vw1 - vw0;
  std::vector<float> amp((size_t)vh * vw);
  float amin = 1e30f, amax = -1e30f;
  for (int y = 0; y < vh; y++)
    for (int x = 0; x < vw; x++) {
      const float* px = &flow[(((size_t)(y + vh0)) * w + (x + vw0)) * 2];
      float a = std::sqrt(px[0] * px[0] + px[1] * px[1]);
      amp[(size_t)y * vw + x] = a;
      amin = std::min(amin, a);
      amax = std::max(amax, a);
    }
  float range = std::max(amax - amin, 1e-12f);
  double sum = 0, sum2 = 0;
  for (auto& a : amp) {
    a = (a - amin) / range;
    sum += a;
    sum2 += (double)a * a;
  }
  const size_t n = amp.size();
  float mean = (float)(sum / n);
  float stdv = (float)std::sqrt(std::max(sum2 / n - (double)mean * mean, 0.0));

  auto collect = [&](float thresh, std::vector<int>& out_idx) {
    out_idx.clear();
    for (size_t i = 0; i < n; i++)
      if (amp[i] > thresh) out_idx.push_back((int)i);
  };
  std::vector<int> cand;
  collect(mean + 2.f * stdv, cand);
  if (cand.empty()) collect(mean + stdv, cand);
  if (cand.empty()) collect(mean, cand);

  std::vector<int> place;
  std::vector<int> mgn;
  if (pp.zero_poke) {
    // placement on background (lowest 5% amplitude), magnitudes from movers
    std::vector<float> sorted(amp.begin(), amp.end());
    std::nth_element(sorted.begin(), sorted.begin() + n / 20, sorted.end());
    float p5 = sorted[n / 20];
    for (size_t i = 0; i < n; i++)
      if (amp[i] < p5) place.push_back((int)i);
    if (place.empty()) place.push_back(0);
    collect(mean + stdv, mgn);
    if (mgn.empty()) collect(mean, mgn);
    if (mgn.empty()) mgn.push_back(0);
  } else {
    place = cand;
  }
  if (place.empty()) {
    for (int i = 0; i < pp.n_pokes_max; i++) centers[i * 2] = centers[i * 2 + 1] = -1;
    return;
  }

  int n_pokes = pp.n_pokes_max;
  if (!pp.fix_n_pokes && pp.n_pokes_max > 1) {
    int hi = std::min<int>(pp.n_pokes_max, (int)place.size());
    n_pokes = 1 + (int)(rng() % (uint64_t)hi);
  }
  memset(poke, 0, (size_t)h * w * 2 * sizeof(float));
  for (int i = 0; i < pp.n_pokes_max; i++) centers[i * 2] = centers[i * 2 + 1] = -1;
  int half = ps / 2;
  for (int k = 0; k < n_pokes; k++) {
    int pi = place[rng() % place.size()];
    int r = pi / vw + vh0, c = pi % vw + vw0;
    int vr = r, vc = c;
    if (pp.zero_poke) {
      int mi = mgn[rng() % mgn.size()];
      vr = mi / vw + vh0;
      vc = mi % vw + vw0;
    }
    for (int dy = -half; dy <= half; dy++)
      for (int dx = -half; dx <= half; dx++) {
        int yy = r + dy, xx = c + dx;
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
        const float* src = pp.equal_poke_val
                               ? &flow[(((size_t)vr) * w + vc) * 2]
                               : &flow[(((size_t)std::clamp(vr + dy, 0, h - 1)) * w +
                                        std::clamp(vc + dx, 0, w - 1)) * 2];
        poke[(((size_t)yy) * w + xx) * 2] = src[0];
        poke[(((size_t)yy) * w + xx) * 2 + 1] = src[1];
      }
    centers[k * 2] = r;
    centers[k * 2 + 1] = c;
  }
}

void ipoke_simulate_pokes(const float* flows, int batch, int h, int w,
                          int poke_size, int n_pokes_max, int fix_n_pokes,
                          int equal_poke_val, int zero_poke, uint64_t seed,
                          float* pokes, int64_t* centers) {
  PokeParams pp{poke_size, n_pokes_max, fix_n_pokes, equal_poke_val, zero_poke};
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < batch; b++) {
    simulate_one(&flows[(size_t)b * h * w * 2], h, w, pp, seed + (uint64_t)b * 7919,
                 &pokes[(size_t)b * h * w * 2], &centers[(size_t)b * n_pokes_max * 2]);
  }
}

// ---------------------------------------------------------------------------
// batched frame loading (OpenMP over (example, frame))
// ---------------------------------------------------------------------------

// paths: batch*t C strings; out: (batch, t, h, w, 3) float32.
int ipoke_load_frames(const char** paths, int batch, int t, int h, int w, float* out) {
  std::atomic<int> err{0};
#pragma omp parallel for collapse(2) schedule(dynamic)
  for (int b = 0; b < batch; b++) {
    for (int i = 0; i < t; i++) {
      int rc = ipoke_load_png(paths[b * t + i], &out[(((size_t)b * t + i) * h * w * 3)], h, w);
      if (rc != 0) err.store(rc);
    }
  }
  return err.load();
}

}  // extern "C"

// Native data-loading runtime: threaded JPEG decode + bilinear resize.
//
// The reference feeds its training loop through torch DataLoader worker
// processes doing cv2 JPEG decode of LSUN background images
// (train_humaniflow.py:43-54, on_the_fly_smpl_train_dataset.py:84-91).
// This library is the TPU framework's native equivalent: a std::thread pool
// decoding batches of JPEGs with libjpeg and resizing to the proxy
// resolution, writing float32 RGB in [0,1] directly into a caller-provided
// NHWC buffer (zero Python-side copies).  Bound via ctypes
// (humaniflow_tpu/data/native_loader.py).
//
// Build: g++ -O3 -shared -fPIC -o libhfdataloader.so dataloader.cc -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into an RGB8 buffer; returns true on success.
bool DecodeJpeg(const char* path, std::vector<unsigned char>& rgb, int& w,
                int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize RGB8 (h, w) -> float32 [0,1] (oh, ow), NHWC.
void ResizeToFloat(const unsigned char* src, int w, int h, float* dst, int ow,
                   int oh) {
  const float sx = static_cast<float>(w) / ow;
  const float sy = static_cast<float>(h) / oh;
  for (int oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > h - 2) y0 = h - 2;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int ox = 0; ox < ow; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > w - 2) x0 = w - 2;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const unsigned char* p00 = src + (static_cast<size_t>(y0) * w + x0) * 3;
      const unsigned char* p01 = p00 + 3;
      const unsigned char* p10 = p00 + static_cast<size_t>(w) * 3;
      const unsigned char* p11 = p10 + 3;
      float* out = dst + (static_cast<size_t>(oy) * ow + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] * (1 - wx) + p01[c] * wx;
        float bot = p10[c] * (1 - wx) + p11[c] * wx;
        out[c] = (top * (1 - wy) + bot * wy) / 255.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` JPEG files and resize each into out[i] = (oh, ow, 3) float32
// NHWC in [0,1].  Runs on `num_threads` worker threads.  Returns the number
// of successfully decoded images; failed slots are zero-filled.
int hf_decode_jpeg_batch(const char** paths, int n, int ow, int oh,
                         float* out, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t img_elems = static_cast<size_t>(ow) * oh * 3;

  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    int w = 0, h = 0;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      float* dst = out + img_elems * i;
      if (DecodeJpeg(paths[i], rgb, w, h) && w >= 2 && h >= 2) {
        ResizeToFloat(rgb.data(), w, h, dst, ow, oh);
        ok.fetch_add(1);
      } else {
        memset(dst, 0, img_elems * sizeof(float));
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"

// Host-side JPEG decode worker — the native data-plane component.
//
// The reference leans on native decoders in its dependencies (mmcv's C image
// ops / libjpeg via OpenCV — SURVEY.md section 2.8); this is the TPU build's
// equivalent: libjpeg decode with an internal thread pool, exposed through a
// C ABI consumed via ctypes (no pybind11 in this image). Output is HWC uint8
// BGR to match the cv2 pipeline convention.
//
// API (all return 0 on success, negative on failure):
//   mvf_jpeg_probe(path, &h, &w, &c)
//   mvf_jpeg_decode(path, out, out_capacity)           // full-size decode
//   mvf_jpeg_decode_batch(paths, n, outs, caps, hs, ws, nthreads)
//
// Batch decode runs on a transient pool of std::thread workers; libjpeg
// contexts are per-thread so decodes are fully parallel (the GIL is released
// on the Python side for the whole batch).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
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

// Decode one JPEG file into caller-provided BGR buffer.
// Returns 0 ok, -1 io error, -2 decode error, -3 buffer too small.
int decode_one(const char* path, unsigned char* out, long capacity,
               int* out_h, int* out_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_EXT_BGR;  // pipeline convention (cv2)
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int c = cinfo.output_components;  // 3 for EXT_BGR
  if (static_cast<long>(w) * h * c > capacity) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -3;
  }
  const int stride = w * c;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + static_cast<long>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  if (out_h) *out_h = h;
  if (out_w) *out_w = w;
  return 0;
}

}  // namespace

extern "C" {

int mvf_jpeg_probe(const char* path, int* h, int* w, int* c) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  *c = 3;
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

int mvf_jpeg_decode(const char* path, unsigned char* out, long capacity,
                    int* h, int* w) {
  return decode_one(path, out, capacity, h, w);
}

// Batch decode with an internal thread pool. outs[i] must have caps[i] bytes.
// rc[i] receives the per-image status. Returns 0 if all succeeded.
int mvf_jpeg_decode_batch(const char** paths, int n, unsigned char** outs,
                          const long* caps, int* hs, int* ws, int* rc,
                          int nthreads) {
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      rc[i] = decode_one(paths[i], outs[i], caps[i], &hs[i], &ws[i]);
      if (rc[i] != 0) failures.fetch_add(1);
    }
  };
  if (nthreads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failures.load() == 0 ? 0 : -1;
}

}  // extern "C"

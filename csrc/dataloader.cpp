// Native data-loader runtime: multi-threaded JPEG/PNG decode + bilinear
// resize + [-1,1] normalization with an order-preserving prefetch ring.
//
// This is the TPU-native replacement for the reference's torch DataLoader
// worker processes (data/custom_dataset_data_loader.py:5-25): worker
// THREADS decode outside the Python GIL via ctypes, so host image IO
// overlaps device compute on a single process (SURVEY §2.3).
//
// C ABI (see impersonator_tpu/data/native.py):
//   void* loader_create(int threads, int capacity, int image_size)
//   void* loader_create_u8(int threads, int capacity, int image_size)
//   int   loader_submit(void*, const char* path, long tag)
//   int   loader_next(void*, float* out, long* tag)       // blocking, FIFO
//   int   loader_next_u8(void*, uint8_t* out, long* tag)
//   void  loader_destroy(void*)
//   int   decode_resize(const char* path, int image_size, float* out)
//   int   decode_resize_u8(const char* path, int image_size, uint8_t* out)
//
// The _u8 variants emit resized RGB uint8 (no normalization): 4x fewer
// host->device bytes per frame — normalization happens on device where
// it fuses into the consumer. Rounding the bilinear output to uint8
// costs at most 0.5/127.5 ≈ 4e-3 vs the float path (the sources are
// 8-bit to begin with).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, RGB
};

// ---------------------------------------------------------------------------
// decoders
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* fp, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* fp, Image* out) {
  uint8_t sig[8];
  if (fread(sig, 1, 8, fp) != 8 || png_sig_cmp(sig, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  // sniff magic
  uint8_t magic[2] = {0, 0};
  if (fread(magic, 1, 2, fp) != 2) {
    fclose(fp);
    return false;
  }
  rewind(fp);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(fp, out);
  } else {
    ok = decode_png(fp, out);
  }
  fclose(fp);
  return ok;
}

// bilinear resize to SxS + normalize to [-1, 1]; matches cv2.resize's
// half-pixel (align_corners=False) convention used by the host pipeline.
void resize_normalize(const Image& img, int s, float* out) {
  const float sx = float(img.w) / s;
  const float sy = float(img.h) / s;
  for (int y = 0; y < s; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = int(fy < 0 ? 0 : fy);
    int y1 = y0 + 1 < img.h ? y0 + 1 : img.h - 1;
    float ty = fy - y0;
    if (ty < 0) ty = 0;
    for (int x = 0; x < s; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = int(fx < 0 ? 0 : fx);
      int x1 = x0 + 1 < img.w ? x0 + 1 : img.w - 1;
      float tx = fx - x0;
      if (tx < 0) tx = 0;
      const uint8_t* p00 = &img.data[(size_t(y0) * img.w + x0) * 3];
      const uint8_t* p01 = &img.data[(size_t(y0) * img.w + x1) * 3];
      const uint8_t* p10 = &img.data[(size_t(y1) * img.w + x0) * 3];
      const uint8_t* p11 = &img.data[(size_t(y1) * img.w + x1) * 3];
      float* dst = out + (size_t(y) * s + x) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float top = p00[ch] * (1 - tx) + p01[ch] * tx;
        float bot = p10[ch] * (1 - tx) + p11[ch] * tx;
        float v = (top * (1 - ty) + bot * ty) / 255.0f;
        dst[ch] = v * 2.0f - 1.0f;
      }
    }
  }
}

// bilinear resize to SxS, rounded to uint8 RGB (no normalization)
void resize_u8(const Image& img, int s, uint8_t* out) {
  const float sx = float(img.w) / s;
  const float sy = float(img.h) / s;
  for (int y = 0; y < s; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = int(fy < 0 ? 0 : fy);
    int y1 = y0 + 1 < img.h ? y0 + 1 : img.h - 1;
    float ty = fy - y0;
    if (ty < 0) ty = 0;
    for (int x = 0; x < s; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = int(fx < 0 ? 0 : fx);
      int x1 = x0 + 1 < img.w ? x0 + 1 : img.w - 1;
      float tx = fx - x0;
      if (tx < 0) tx = 0;
      const uint8_t* p00 = &img.data[(size_t(y0) * img.w + x0) * 3];
      const uint8_t* p01 = &img.data[(size_t(y0) * img.w + x1) * 3];
      const uint8_t* p10 = &img.data[(size_t(y1) * img.w + x0) * 3];
      const uint8_t* p11 = &img.data[(size_t(y1) * img.w + x1) * 3];
      uint8_t* dst = out + (size_t(y) * s + x) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float top = p00[ch] * (1 - tx) + p01[ch] * tx;
        float bot = p10[ch] * (1 - tx) + p11[ch] * tx;
        float v = top * (1 - ty) + bot * ty + 0.5f;
        dst[ch] = uint8_t(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// prefetching loader
// ---------------------------------------------------------------------------

struct Job {
  uint64_t seq;
  std::string path;
  long tag;
};

struct Result {
  long tag;
  bool ok;
  std::vector<float> pixels;      // float mode
  std::vector<uint8_t> pixels_u8;  // u8 mode
};

struct Loader {
  int image_size;
  bool u8 = false;
  size_t capacity;
  std::vector<std::thread> workers;

  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  std::deque<Job> jobs;
  std::map<uint64_t, Result> done;  // ordered by sequence
  uint64_t next_submit = 0;
  uint64_t next_emit = 0;
  bool shutdown = false;

  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return shutdown || !jobs.empty(); });
        if (shutdown && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      Result res;
      res.tag = job.tag;
      Image img;
      res.ok = decode_file(job.path.c_str(), &img);
      if (res.ok) {
        if (u8) {
          res.pixels_u8.resize(size_t(image_size) * image_size * 3);
          resize_u8(img, image_size, res.pixels_u8.data());
        } else {
          res.pixels.resize(size_t(image_size) * image_size * 3);
          resize_normalize(img, image_size, res.pixels.data());
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        done.emplace(job.seq, std::move(res));
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(int threads, int capacity, int image_size) {
  auto* l = new Loader();
  l->image_size = image_size;
  l->capacity = capacity > 0 ? capacity : 64;
  int n = threads > 0 ? threads : 2;
  for (int i = 0; i < n; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

int loader_submit(void* handle, const char* path, long tag) {
  auto* l = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(l->mu);
    // bound memory: don't run unboundedly ahead of the consumer
    l->cv_done.wait(lk, [&] {
      return l->shutdown ||
             (l->next_submit - l->next_emit) < l->capacity;
    });
    if (l->shutdown) return -1;
    l->jobs.push_back(Job{l->next_submit++, path, tag});
  }
  l->cv_job.notify_one();
  return 0;
}

static int pop_next(Loader* l, Result* res, long* tag) {
  {
    std::unique_lock<std::mutex> lk(l->mu);
    if (l->next_emit >= l->next_submit) return -2;  // nothing pending
    uint64_t want = l->next_emit;
    l->cv_done.wait(lk, [&] { return l->done.count(want) > 0; });
    *res = std::move(l->done[want]);
    l->done.erase(want);
    l->next_emit++;
  }
  l->cv_done.notify_all();
  if (tag) *tag = res->tag;
  return res->ok ? 0 : -1;
}

int loader_next(void* handle, float* out, long* tag) {
  auto* l = static_cast<Loader*>(handle);
  if (l->u8) return -3;  // mode mismatch: created with loader_create_u8
  Result res;
  int rc = pop_next(l, &res, tag);
  if (rc != 0) return rc;
  std::memcpy(out, res.pixels.data(), res.pixels.size() * sizeof(float));
  return 0;
}

int loader_next_u8(void* handle, uint8_t* out, long* tag) {
  auto* l = static_cast<Loader*>(handle);
  if (!l->u8) return -3;  // mode mismatch: created with loader_create
  Result res;
  int rc = pop_next(l, &res, tag);
  if (rc != 0) return rc;
  std::memcpy(out, res.pixels_u8.data(), res.pixels_u8.size());
  return 0;
}

void loader_destroy(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->shutdown = true;
  }
  l->cv_job.notify_all();
  l->cv_done.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

int decode_resize(const char* path, int image_size, float* out) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  resize_normalize(img, image_size, out);
  return 0;
}

void* loader_create_u8(int threads, int capacity, int image_size) {
  auto* l = static_cast<Loader*>(
      loader_create(threads, capacity, image_size));
  l->u8 = true;
  return l;
}

int decode_resize_u8(const char* path, int image_size, uint8_t* out) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  resize_u8(img, image_size, out);
  return 0;
}

}  // extern "C"

// Native threaded image loader + prefetcher for the training pipelines.
//
// Role parity: the reference pipelines lean on native decode throughput
// (decord for video in CogVideoX/data_video.py, cv2 in the scene readers);
// this is the framework's equivalent runtime component: a libpng decoder
// with bilinear resize and a ring-buffer prefetch pool that overlaps host
// decode with TPU compute.
//
// C API (ctypes-friendly):
//   fnx_decode_png(path, out_f32, H, W, gray) -> 0/err — decode+resize+normalize
//   fnx_loader_create(paths, n, threads, H, W, gray, queue) -> handle
//   fnx_loader_next(handle, out_f32, index_out) -> 0 when ok, 1 when drained
//   fnx_loader_destroy(handle)
//
// Build: make -C fluidnexus_tpu/runtime    (g++ -O3 -shared -lpng)
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;
};

bool decode_png_file(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = (int)h;
  out->w = (int)w;
  out->c = 3;
  out->data.resize((size_t)h * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out->data.data() + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// bilinear resize uint8 RGB -> float32 [0,1], optional grayscale (CHW or HW)
void resize_normalize(const Image& img, float* out, int oh, int ow, int gray) {
  const float sy = (float)img.h / oh;
  const float sx = (float)img.w / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : (int)fy;
    int y1 = y0 + 1 < img.h ? y0 + 1 : img.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : (int)fx;
      int x1 = x0 + 1 < img.w ? x0 + 1 : img.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      float px[3];
      for (int ch = 0; ch < 3; ++ch) {
        float v00 = img.data[((size_t)y0 * img.w + x0) * 3 + ch];
        float v01 = img.data[((size_t)y0 * img.w + x1) * 3 + ch];
        float v10 = img.data[((size_t)y1 * img.w + x0) * 3 + ch];
        float v11 = img.data[((size_t)y1 * img.w + x1) * 3 + ch];
        px[ch] = ((v00 * (1 - wx) + v01 * wx) * (1 - wy) +
                  (v10 * (1 - wx) + v11 * wx) * wy) / 255.0f;
      }
      if (gray) {
        // ITU-R 601 luma — matches PIL Image.convert("L")
        out[(size_t)y * ow + x] = 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2];
      } else {
        // CHW layout to match the renderer's channel-first images
        out[(size_t)0 * oh * ow + (size_t)y * ow + x] = px[0];
        out[(size_t)1 * oh * ow + (size_t)y * ow + x] = px[1];
        out[(size_t)2 * oh * ow + (size_t)y * ow + x] = px[2];
      }
    }
  }
}

struct Loader {
  std::vector<std::string> paths;
  int oh, ow, gray, channels;
  size_t frame_floats;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<std::pair<int, std::vector<float>>> ready;
  std::atomic<size_t> next_index{0};
  size_t max_queue;
  std::atomic<int> live_workers{0};
  bool stop = false;

  void worker() {
    for (;;) {
      size_t i = next_index.fetch_add(1);
      if (i >= paths.size()) break;
      std::vector<float> buf(frame_floats, 0.0f);
      Image img;
      if (decode_png_file(paths[i].c_str(), &img)) {
        resize_normalize(img, buf.data(), oh, ow, gray);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_queue || stop; });
      if (stop) break;
      ready.emplace((int)i, std::move(buf));
      cv_ready.notify_one();
    }
    if (live_workers.fetch_sub(1) == 1) {
      std::lock_guard<std::mutex> lk(mu);
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int fnx_decode_png(const char* path, float* out, int oh, int ow, int gray) {
  Image img;
  if (!decode_png_file(path, &img)) return 1;
  resize_normalize(img, out, oh, ow, gray);
  return 0;
}

void* fnx_loader_create(const char** paths, int n, int threads, int oh, int ow,
                        int gray, int queue) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->oh = oh;
  l->ow = ow;
  l->gray = gray;
  l->channels = gray ? 1 : 3;
  l->frame_floats = (size_t)l->channels * oh * ow;
  l->max_queue = queue > 0 ? (size_t)queue : 8;
  int t = threads > 0 ? threads : 2;
  l->live_workers = t;
  for (int i = 0; i < t; ++i) l->workers.emplace_back(&Loader::worker, l);
  return l;
}

int fnx_loader_next(void* handle, float* out, int* index_out) {
  auto* l = (Loader*)handle;
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_ready.wait(lk, [&] { return !l->ready.empty() || l->live_workers.load() == 0; });
  if (l->ready.empty()) return 1;  // drained
  auto item = std::move(l->ready.front());
  l->ready.pop();
  l->cv_space.notify_one();
  lk.unlock();
  *index_out = item.first;
  std::memcpy(out, item.second.data(), item.second.size() * sizeof(float));
  return 0;
}

void fnx_loader_destroy(void* handle) {
  auto* l = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
    l->cv_space.notify_all();
    l->cv_ready.notify_all();
  }
  l->next_index = l->paths.size();
  for (auto& w : l->workers) w.join();
  delete l;
}

}  // extern "C"

// vbr_host — native host runtime for the TPU reconstruction framework.
//
// Two subsystems, exposed through a plain C API for ctypes:
//
//  1. Multi-camera video ingest with threaded prefetch: each camera's
//     decode runs on its own worker thread into a bounded ring buffer of
//     synchronized frame-sets, so TPU compute overlaps with host decode
//     (the pipeline-parallel stage the reference lacks — its decode is
//     inline and sequential, assignment.py:94).
//
//  2. A thin wrapper over cv::bgsegm::BackgroundSubtractorMOG — the exact
//     C++ model the reference's production path uses
//     (background_subtraction.py:70-71).  The Python cv2 wheel in this
//     environment lacks the bgsegm contrib module, so this binding serves
//     as the parity oracle for the JAX MOG implementation (and as a host
//     fallback model).
//
// Build: see build.py (g++ -O2 -shared, links opencv core/videoio/bgsegm).

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/bgsegm.hpp>
#include <opencv2/core.hpp>
#include <opencv2/videoio.hpp>

namespace {

struct FrameSet {
  std::vector<cv::Mat> frames;  // one BGR frame per camera
  bool end_of_stream = false;
};

class MultiSource {
 public:
  MultiSource(const std::vector<std::string>& paths, int queue_capacity)
      : capacity_(queue_capacity), stop_(false), eos_(false) {
    for (const auto& p : paths) {
      caps_.emplace_back(p);
      if (!caps_.back().isOpened()) {
        ok_ = false;
        return;
      }
    }
    width_ = static_cast<int>(caps_[0].get(cv::CAP_PROP_FRAME_WIDTH));
    height_ = static_cast<int>(caps_[0].get(cv::CAP_PROP_FRAME_HEIGHT));
    worker_ = std::thread(&MultiSource::DecodeLoop, this);
  }

  ~MultiSource() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  bool ok() const { return ok_; }
  int width() const { return width_; }
  int height() const { return height_; }
  int num_cameras() const { return static_cast<int>(caps_.size()); }

  // Copies the next synchronized frame-set into out (C, H, W, 3) u8.
  // Returns 1 on success, 0 at end of stream.
  int Next(uint8_t* out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [&] { return !queue_.empty() || stop_ || eos_; });
    if (queue_.empty()) return 0;  // stopped or already past end-of-stream
    FrameSet fs = std::move(queue_.front());
    queue_.pop_front();
    if (fs.end_of_stream) {
      // Latch EOS so further Next() calls return immediately instead of
      // waiting forever on the exited decode thread.
      eos_ = true;
      lk.unlock();
      cv_space_.notify_one();
      return 0;
    }
    lk.unlock();
    cv_space_.notify_one();
    const size_t frame_bytes =
        static_cast<size_t>(height_) * width_ * 3;
    for (size_t c = 0; c < fs.frames.size(); ++c) {
      cv::Mat m = fs.frames[c];
      if (!m.isContinuous()) m = m.clone();
      std::memcpy(out + c * frame_bytes, m.data, frame_bytes);
    }
    return 1;
  }

 private:
  void DecodeLoop() {
    while (true) {
      FrameSet fs;
      fs.frames.resize(caps_.size());
      bool ok_all = true;
      for (size_t c = 0; c < caps_.size(); ++c) {
        if (!caps_[c].read(fs.frames[c])) {
          ok_all = false;
          break;
        }
      }
      if (!ok_all) fs.end_of_stream = true;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(
            lk, [&] { return static_cast<int>(queue_.size()) < capacity_ ||
                             stop_; });
        if (stop_) return;
        queue_.push_back(std::move(fs));
      }
      cv_data_.notify_one();
      if (!ok_all) return;
    }
  }

  std::vector<cv::VideoCapture> caps_;
  std::deque<FrameSet> queue_;
  int capacity_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::thread worker_;
  bool stop_, eos_;
  bool ok_ = true;
  int width_ = 0, height_ = 0;
};

}  // namespace

extern "C" {

// ---- multi-camera prefetching source ----

void* vbr_source_open(const char** paths, int num_cameras,
                      int queue_capacity) {
  std::vector<std::string> ps;
  for (int i = 0; i < num_cameras; ++i) ps.emplace_back(paths[i]);
  auto* src = new MultiSource(ps, queue_capacity);
  if (!src->ok()) {
    delete src;
    return nullptr;
  }
  return src;
}

int vbr_source_dims(void* handle, int* width, int* height) {
  auto* src = static_cast<MultiSource*>(handle);
  *width = src->width();
  *height = src->height();
  return src->num_cameras();
}

int vbr_source_next(void* handle, uint8_t* out) {
  return static_cast<MultiSource*>(handle)->Next(out);
}

void vbr_source_close(void* handle) {
  delete static_cast<MultiSource*>(handle);
}

// ---- cv::bgsegm MOG oracle ----

void* vbr_mog_create(int history, int nmixtures, double background_ratio,
                     double noise_sigma) {
  auto model = cv::bgsegm::createBackgroundSubtractorMOG(
      history, nmixtures, background_ratio, noise_sigma);
  // keep the smart pointer alive behind a raw handle
  return new cv::Ptr<cv::bgsegm::BackgroundSubtractorMOG>(model);
}

// frame: (H, W, 3) u8; writes the (H, W) u8 mask into out.
void vbr_mog_apply(void* handle, const uint8_t* frame, int height, int width,
                   double learning_rate, uint8_t* out) {
  auto* ptr =
      static_cast<cv::Ptr<cv::bgsegm::BackgroundSubtractorMOG>*>(handle);
  cv::Mat img(height, width, CV_8UC3, const_cast<uint8_t*>(frame));
  cv::Mat mask;
  (*ptr)->apply(img, mask, learning_rate);
  std::memcpy(out, mask.data, static_cast<size_t>(height) * width);
}

void vbr_mog_release(void* handle) {
  delete static_cast<cv::Ptr<cv::bgsegm::BackgroundSubtractorMOG>*>(handle);
}

// ---- video encoder (annotated calibration artifacts) ----
//
// mp4v writer matching the reference's annotated corner-detection videos
// (camera_calibration.py:441-444,508-509 → intrinsics_imagepoints.mp4).

void* vbr_writer_create(const char* path, double fps, int width, int height) {
  auto* w = new cv::VideoWriter(
      path, cv::VideoWriter::fourcc('m', 'p', '4', 'v'), fps,
      cv::Size(width, height));
  if (!w->isOpened()) {
    delete w;
    return nullptr;
  }
  return w;
}

// frame: (H, W, 3) u8 BGR, dimensions must match the writer's.
int vbr_writer_write(void* handle, const uint8_t* frame, int height,
                     int width) {
  auto* w = static_cast<cv::VideoWriter*>(handle);
  cv::Mat img(height, width, CV_8UC3, const_cast<uint8_t*>(frame));
  w->write(img);
  return 1;
}

void vbr_writer_release(void* handle) {
  auto* w = static_cast<cv::VideoWriter*>(handle);
  w->release();
  delete w;
}

// ---- YUV 4:2:0 wire-format pack (reduced-byte ingest, r5) ----
//
// Byte-identical to the numpy reference in ops/color.py
// (integer BT.601 full-range, arithmetic shifts, 2x2 chroma mean with
// +2 rounding, final clip) -- gated by tests/test_reduced_ingest.py.
// The numpy pack costs ~107 ms per 4-camera frame-set on this one-core
// host (it was the end-to-end bottleneck, not the link); this loop runs
// at memory speed.

void vbr_yuv420_pack(const uint8_t* bgr, int C, int H, int W,
                     uint8_t* out) {
  const int plane = H * W;
  const int out_plane = (H * 3 / 2) * W;
  for (int c = 0; c < C; ++c) {
    const uint8_t* src = bgr + static_cast<long>(c) * plane * 3;
    uint8_t* dst_y = out + static_cast<long>(c) * out_plane;
    uint8_t* dst_ch = dst_y + plane;  // (H/2, W): U left, V right
    for (int i = 0; i < H; i += 2) {
      const uint8_t* r0 = src + static_cast<long>(i) * W * 3;
      const uint8_t* r1 = r0 + W * 3;
      uint8_t* y0 = dst_y + static_cast<long>(i) * W;
      uint8_t* y1 = y0 + W;
      uint8_t* urow = dst_ch + static_cast<long>(i / 2) * W;
      uint8_t* vrow = urow + W / 2;
      for (int j = 0; j < W; j += 2) {
        int us = 0, vs = 0;
        const uint8_t* px[4] = {r0 + 3 * j, r0 + 3 * (j + 1),
                                r1 + 3 * j, r1 + 3 * (j + 1)};
        uint8_t* yo[4] = {y0 + j, y0 + j + 1, y1 + j, y1 + j + 1};
        for (int k = 0; k < 4; ++k) {
          const int b = px[k][0], g = px[k][1], r = px[k][2];
          int y = (77 * r + 150 * g + 29 * b + 128) >> 8;
          us += ((-43 * r - 85 * g + 128 * b + 128) >> 8) + 128;
          vs += ((128 * r - 107 * g - 21 * b + 128) >> 8) + 128;
          *yo[k] = static_cast<uint8_t>(y < 0 ? 0 : (y > 255 ? 255 : y));
        }
        int u = (us + 2) >> 2, v = (vs + 2) >> 2;
        urow[j / 2] = static_cast<uint8_t>(u < 0 ? 0 : (u > 255 ? 255 : u));
        vrow[j / 2] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// ---- marching-cubes wire emission (surface streaming, r5) ----
//
// Host tail of the wire-format surface stream: triangles from
// (cell idx, config) pairs via the generated 256-entry table.  Float
// op order matches ops/marching_cubes.triangles_from_wire's numpy
// reference exactly ((v + base) * spacing + origin, f32), so the
// output is bitwise identical (test-gated).  The numpy tail costs
// ~300-400 ms per frame on this one-core host -- it capped the wire
// surface stream at ~8 fps.

int vbr_mc_emit(const int32_t* idx, const uint8_t* cfg, int n,
                const float* table, const uint8_t* tvalid, int T,
                int ny1, int nz1, const float* origin,
                const float* spacing, float* out) {
  long m = 0;
  const long plane = (long)ny1 * nz1;
  for (int i = 0; i < n; ++i) {
    const int c = cfg[i];
    const long id = idx[i];
    const float base[3] = {
        (float)(id / plane), (float)((id / nz1) % ny1),
        (float)(id % nz1)};
    const float* trow = table + (long)c * T * 9;
    const uint8_t* vrow = tvalid + (long)c * T;
    for (int t = 0; t < T; ++t) {
      if (!vrow[t]) continue;
      const float* v = trow + (long)t * 9;
      float* o = out + m * 9;
      for (int k = 0; k < 9; ++k) {
        const int ax = k % 3;
        o[k] = (v[k] + base[ax]) * spacing[ax] + origin[ax];
      }
      ++m;
    }
  }
  return (int)m;
}

}  // extern "C"

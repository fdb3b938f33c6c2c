// Multithreaded batch JPEG decoder (component C2 host side).
//
// The reference decodes frames one-by-one through PIL/cv2 inside its Python
// loop (SURVEY.md L0). At the framework's target rate (1500 fps/chip x 8
// chips = 12k decodes/sec, SURVEY.md §7 hard-parts) the host needs a
// GIL-free thread pool feeding pinned buffers. This shim drives libjpeg
// (turbo where the system lib is turbo) from a persistent C++ thread pool;
// Python talks to it via ctypes (no pybind11 in this environment).
//
// API (C, ctypes-friendly):
//   w2t_decoder_create(n_threads)        -> opaque pool handle
//   w2t_decoder_destroy(handle)
//   w2t_decode_batch(handle, n,
//                    const uint8_t** srcs, const size_t* src_lens,
//                    uint8_t* dst, size_t dst_stride,   // per-image bytes
//                    int exp_h, int exp_w)              // expected HxW (RGB)
//     -> number of successful decodes; images that fail or mismatch the
//        expected size leave their dst slot zeroed.
#include <cstddef>  // size_t — jpeglib.h uses it without including it
#include <cstdio>   // FILE

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG into dst (RGB, row-major). Returns true on success with
// exactly (exp_h, exp_w). scale_num/scale_denom request libjpeg's
// DCT-domain scaled decode (1/2, 1/4, 1/8 everywhere; turbo supports M/8):
// decoding a 1280x1920 Waymo frame directly at 1/2 does ~4x less IDCT +
// color-convert work than full decode — the host-ingestion lever for the
// 512x768 production preset (SURVEY.md §7 12k-decodes/sec budget).
bool decode_one(const uint8_t* src, size_t len, uint8_t* dst, int exp_h,
                int exp_w, int scale_num = 1, int scale_denom = 1) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(src), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = static_cast<unsigned int>(scale_num);
  cinfo.scale_denom = static_cast<unsigned int>(scale_denom);
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != exp_h ||
      static_cast<int>(cinfo.output_width) != exp_w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  const size_t row_bytes = static_cast<size_t>(exp_w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = dst + static_cast<size_t>(cinfo.output_scanline) * row_bytes;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

}  // namespace

extern "C" {

void* w2t_decoder_create(int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  return new ThreadPool(n_threads);
}

void w2t_decoder_destroy(void* handle) {
  delete static_cast<ThreadPool*>(handle);
}

// scale_num/scale_denom: DCT-scaled decode; exp_h/exp_w are the EXPECTED
// POST-SCALE dimensions (libjpeg rounds up: ceil(src * num / denom)).
int w2t_decode_batch_scaled(void* handle, int n, const uint8_t** srcs,
                            const size_t* src_lens, uint8_t* dst,
                            size_t dst_stride, int exp_h, int exp_w,
                            int scale_num, int scale_denom) {
  ThreadPool* pool = static_cast<ThreadPool*>(handle);
  std::atomic<int> ok_count{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;

  for (int i = 0; i < n; ++i) {
    pool->submit([&, i] {
      uint8_t* out = dst + static_cast<size_t>(i) * dst_stride;
      if (decode_one(srcs[i], src_lens[i], out, exp_h, exp_w, scale_num,
                     scale_denom)) {
        ok_count.fetch_add(1, std::memory_order_relaxed);
      } else {
        std::memset(out, 0, dst_stride);
      }
      if (done.fetch_add(1, std::memory_order_acq_rel) + 1 == n) {
        std::lock_guard<std::mutex> lock(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lock(mu);
  cv.wait(lock, [&] { return done.load(std::memory_order_acquire) == n; });
  return ok_count.load();
}

int w2t_decode_batch(void* handle, int n, const uint8_t** srcs,
                     const size_t* src_lens, uint8_t* dst, size_t dst_stride,
                     int exp_h, int exp_w) {
  return w2t_decode_batch_scaled(handle, n, srcs, src_lens, dst, dst_stride,
                                 exp_h, exp_w, 1, 1);
}

}  // extern "C"

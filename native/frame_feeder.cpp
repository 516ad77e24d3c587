// Threaded prefetching frame feeder — the TPU-host runtime replacement for
// the reference's camera→VO handoff (`SvoSystem::add_img` condvar queue,
// svo_system.cpp:33-73, and the AImageReader callback thread,
// android_main.cpp:40-68).  Worker threads decode dataset images (PNG/PGM)
// ahead of the consumer into a bounded ring of pinned host buffers, so the
// accelerator never waits on file IO or decode.
//
// C ABI for ctypes (no pybind11 in this environment).

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "png_decode.h"

namespace {

struct Slot {
  int index = -1;              // sequence position
  svo_native::GrayImage img;
  bool ok = false;
};

class FrameFeeder {
 public:
  FrameFeeder(std::vector<std::string> paths, int capacity, int n_threads)
      : paths_(std::move(paths)),
        capacity_(capacity > 0 ? capacity : 8),
        next_to_decode_(0) {
    if (n_threads <= 0) n_threads = 2;
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { WorkerLoop(); });
  }

  ~FrameFeeder() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocking: copies the next frame (in sequence order) into out (h*w
  // floats).  Returns the frame index, -1 at end of sequence, -2 on decode
  // error, -3 on size mismatch.
  int Next(float* out, int want_h, int want_w) {
    std::unique_lock<std::mutex> lk(mu_);
    int want = next_to_consume_;
    if (want >= static_cast<int>(paths_.size())) return -1;
    cv_data_.wait(lk, [&] {
      return stop_ || ready_.count(want) > 0;
    });
    if (stop_ && ready_.count(want) == 0) return -1;
    Slot slot = std::move(ready_[want]);
    ready_.erase(want);
    ++next_to_consume_;
    lk.unlock();
    cv_space_.notify_all();
    if (!slot.ok) return -2;
    if (slot.img.height != want_h || slot.img.width != want_w) return -3;
    std::memcpy(out, slot.img.pixels.data(),
                sizeof(float) * want_h * want_w);
    return slot.index;
  }

  int Count() const { return static_cast<int>(paths_.size()); }

  // Peek dimensions of frame 0 (blocking until decoded).
  bool Dims(int* h, int* w) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [&] { return stop_ || ready_.count(0) > 0; });
    if (ready_.count(0) == 0) return false;
    *h = ready_[0].img.height;
    *w = ready_[0].img.width;
    return true;
  }

 private:
  void WorkerLoop() {
    while (true) {
      int my_index;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [&] {
          return stop_ ||
                 (next_to_decode_ < static_cast<int>(paths_.size()) &&
                  next_to_decode_ - next_to_consume_ < capacity_);
        });
        if (stop_) return;
        if (next_to_decode_ >= static_cast<int>(paths_.size())) return;
        my_index = next_to_decode_++;
      }
      Slot slot;
      slot.index = my_index;
      slot.ok = Decode(paths_[my_index], &slot.img);
      {
        std::lock_guard<std::mutex> lk(mu_);
        ready_[my_index] = std::move(slot);
      }
      cv_data_.notify_all();
    }
  }

  static bool Decode(const std::string& path, svo_native::GrayImage* img) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    size_t rd = std::fread(buf.data(), 1, n, f);
    std::fclose(f);
    if (rd != static_cast<size_t>(n)) return false;
    if (n > 8 && buf[0] == 137 && buf[1] == 'P')
      return svo_native::DecodePngGray(buf.data(), buf.size(), img);
    if (n > 2 && buf[0] == 'P' && buf[1] == '5')
      return svo_native::DecodePgmGray(buf.data(), buf.size(), img);
    return false;
  }

  std::vector<std::string> paths_;
  const int capacity_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::map<int, Slot> ready_;
  int next_to_decode_;
  int next_to_consume_ = 0;
  bool stop_ = false;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* ff_create(const char** paths, int n_paths, int capacity,
                int n_threads) {
  std::vector<std::string> v(paths, paths + n_paths);
  return new FrameFeeder(std::move(v), capacity, n_threads);
}

int ff_next(void* handle, float* out, int h, int w) {
  return static_cast<FrameFeeder*>(handle)->Next(out, h, w);
}

int ff_count(void* handle) {
  return static_cast<FrameFeeder*>(handle)->Count();
}

int ff_dims(void* handle, int* h, int* w) {
  return static_cast<FrameFeeder*>(handle)->Dims(h, w) ? 0 : -1;
}

void ff_destroy(void* handle) {
  delete static_cast<FrameFeeder*>(handle);
}

int ff_decode_file(const char* path, float* out, int max_pixels,
                   int* h, int* w) {
  // one-shot decode helper (also exercises the decoder from tests)
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  size_t rd = std::fread(buf.data(), 1, n, f);
  std::fclose(f);
  if (rd != static_cast<size_t>(n)) return -1;
  svo_native::GrayImage img;
  bool ok = false;
  if (n > 8 && buf[0] == 137)
    ok = svo_native::DecodePngGray(buf.data(), buf.size(), &img);
  else
    ok = svo_native::DecodePgmGray(buf.data(), buf.size(), &img);
  if (!ok) return -2;
  if (img.width * img.height > max_pixels) return -3;
  *h = img.height;
  *w = img.width;
  std::memcpy(out, img.pixels.data(),
              sizeof(float) * img.width * img.height);
  return 0;
}

}  // extern "C"

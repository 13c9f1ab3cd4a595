// Native video decode: mp4 -> model-ready tensors with no Python in the
// frame path.
//
// The reference's phase-2 ETL shells out to ffmpeg to dump %04d.jpg frames
// (run.py:31-57) and phase-4's Custom_video_dataset re-reads those via
// per-item python cv2 calls (Custom_Video_dataset.py:44-73). This is the
// TPU-native replacement for both: libavcodec (through OpenCV's C++
// VideoCapture, which runs the codec's own thread pool) decodes straight
// into the caller's batch buffer — centre-crop square, resize, RGB — as
// uint8 (normalize-on-device path, 4x less host->HBM traffic) or float32
// in [0,1) (the /256 convention of H36_dataset.py:129-131).
//
// Exposed via a plain C ABI consumed by ctypes
// (pose3d_tpu/data/native_video.py). Build: pose3d_tpu/native/build.sh
// (separate .so so the JPEG loader does not depend on OpenCV).

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

struct Decoder {
  cv::VideoCapture cap;
  // stride phase carries across read calls so chunked reads pick exactly
  // the frames a single big read would
  int idx = 0;
};

// centre-crop to square then resize to (size, size), BGR -> RGB.
void CropResizeRgb(const cv::Mat& bgr, int size, cv::Mat* rgb_out) {
  const int h = bgr.rows, w = bgr.cols;
  const int side = h < w ? h : w;
  const int y0 = (h - side) / 2, x0 = (w - side) / 2;
  cv::Mat crop = bgr(cv::Rect(x0, y0, side, side));
  cv::Mat resized;
  if (side == size) {
    resized = crop;
  } else {
    // INTER_LINEAR: cv2.resize's default, matching the python path
    cv::resize(crop, resized, cv::Size(size, size), 0, 0, cv::INTER_LINEAR);
  }
  cv::cvtColor(resized, *rgb_out, cv::COLOR_BGR2RGB);
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
  auto* d = new Decoder();
  if (!d->cap.open(path)) {
    delete d;
    return nullptr;
  }
  return d;
}

void vd_close(void* handle) { delete static_cast<Decoder*>(handle); }

// n_frames may be 0 for streams whose container lies; fps may be 0.
void vd_info(void* handle, int* n_frames, int* width, int* height,
             double* fps) {
  auto* d = static_cast<Decoder*>(handle);
  *n_frames = static_cast<int>(d->cap.get(cv::CAP_PROP_FRAME_COUNT));
  *width = static_cast<int>(d->cap.get(cv::CAP_PROP_FRAME_WIDTH));
  *height = static_cast<int>(d->cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  *fps = d->cap.get(cv::CAP_PROP_FPS);
}

// Read up to max_frames frames (every stride-th), centre-crop square,
// resize to (size, size), RGB uint8 into out (max_frames, size, size, 3).
// Returns the number of frames written.
int vd_read_frames_u8(void* handle, int size, int stride, int max_frames,
                      uint8_t* out) {
  auto* d = static_cast<Decoder*>(handle);
  const size_t frame_elems = static_cast<size_t>(size) * size * 3;
  cv::Mat bgr, rgb;
  int written = 0;
  while (written < max_frames && d->cap.read(bgr)) {
    if (d->idx++ % stride) continue;
    CropResizeRgb(bgr, size, &rgb);
    std::memcpy(out + written * frame_elems, rgb.data, frame_elems);
    ++written;
  }
  return written;
}

// Same, but float32 in [0,1) — the /256 convention.
int vd_read_frames_f32(void* handle, int size, int stride, int max_frames,
                       float* out) {
  auto* d = static_cast<Decoder*>(handle);
  const size_t frame_elems = static_cast<size_t>(size) * size * 3;
  cv::Mat bgr, rgb, f32;
  int written = 0;
  while (written < max_frames && d->cap.read(bgr)) {
    if (d->idx++ % stride) continue;
    CropResizeRgb(bgr, size, &rgb);
    rgb.convertTo(f32, CV_32FC3, 1.0 / 256.0);
    std::memcpy(out + written * frame_elems, f32.ptr<float>(),
                frame_elems * sizeof(float));
    ++written;
  }
  return written;
}

// ETL parity path: dump fps-resampled frames as <out_dir>/%04d.jpg
// (1-based, the reference's run_ffmpeg layout, run.py:31-57). ``step`` is
// source frames per kept frame (>= 1.0); the fractional keep rule
// (keep when i >= next_keep, next_keep += step) matches
// pose3d_tpu/pipeline/video.py::iter_frames exactly, so native and python
// extraction choose identical frames. Returns frames written.
int vd_extract_jpegs(const char* path, const char* out_dir, int quality,
                     double step) {
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return -1;
  if (step < 1.0) step = 1.0;
  std::vector<int> params = {cv::IMWRITE_JPEG_QUALITY, quality};
  cv::Mat bgr;
  int n = 0, i = 0;
  double next_keep = 0.0;
  char name[4096];
  while (cap.read(bgr)) {
    if (i++ >= next_keep) {
      next_keep += step;
      std::snprintf(name, sizeof(name), "%s/%04d.jpg", out_dir, ++n);
      if (!cv::imwrite(name, bgr, params)) return -1;
    }
  }
  return n;
}

// fps of the container (0 when unknown) — lets the caller compute step.
double vd_fps(const char* path) {
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return -1.0;
  return cap.get(cv::CAP_PROP_FPS);
}

}  // extern "C"

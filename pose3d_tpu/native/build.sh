#!/bin/sh
# Build the native shared libraries. Re-run after editing the .cc files.
#   libposeloader.so — threaded JPEG decode/resize/normalize + gather
#   libposevideo.so  — video decode -> model-ready tensors (needs OpenCV;
#                      built best-effort so the JPEG loader never depends
#                      on it)
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 loader.cc -ljpeg -lpthread \
    -o libposeloader.so
echo "built $(pwd)/libposeloader.so"
if g++ -O3 -march=native -shared -fPIC -std=c++17 video.cc \
    -I/usr/include/opencv4 \
    -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_videoio -lpthread \
    -o libposevideo.so 2>/dev/null; then
  echo "built $(pwd)/libposevideo.so"
else
  echo "libposevideo.so skipped (OpenCV C++ not available)" >&2
fi

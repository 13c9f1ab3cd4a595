#!/bin/sh
# Build the native loader shared library. Re-run after editing loader.cc.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 loader.cc -ljpeg -lpthread \
    -o libposeloader.so
echo "built $(pwd)/libposeloader.so"

#!/usr/bin/env bash
# Build the native helpers. Produces native/libfastply.so, which
# pointcloud_orientation_tpu/data/fastply.py picks up automatically
# (everything falls back to pure NumPy when the library is absent).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -o libfastply.so fastply.cc
echo "built $(pwd)/libfastply.so"

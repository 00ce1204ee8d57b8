#!/bin/bash
# Build the native data-loader library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -shared -fPIC \
    -o libphendiff_native.so phendiff_native.cpp
echo "built $(pwd)/libphendiff_native.so"

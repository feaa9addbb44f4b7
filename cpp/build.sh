#!/usr/bin/env bash
# Build the native host ops shared library (ctypes ABI).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    native_ops.cpp -o libspr_native.so
echo "built $(pwd)/libspr_native.so"

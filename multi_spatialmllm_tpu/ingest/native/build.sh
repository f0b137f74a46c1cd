#!/usr/bin/env bash
# Build the native ingestion helpers into libmsm_native.so.
set -euo pipefail
cd "$(dirname "$0")"
# -march=native: the library is always (re)built on the machine that uses
# it (ingest.native.build()), so host-specific SIMD is safe.
g++ -O3 -march=native -fPIC -shared -std=c++17 -o libmsm_native.so \
    src/msm_native.cpp src/jsonl_emit.cpp src/jpeg_encode.cpp \
    -lz -lpthread
echo "built $(pwd)/libmsm_native.so"

#!/usr/bin/env bash
# Build the native ingestion helpers into libmsm_native.so.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libmsm_native.so \
    src/msm_native.cpp src/jsonl_emit.cpp \
    -lz -lpthread
echo "built $(pwd)/libmsm_native.so"

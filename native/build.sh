#!/bin/sh
# Build the native host-IO runtime into the package.
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -shared -fPIC -o ../audio_matcher_tpu/hostio/_am_native.so \
    am_native.cpp -ldl
echo "built audio_matcher_tpu/hostio/_am_native.so"

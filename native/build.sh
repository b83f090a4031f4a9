#!/bin/sh
# Build the native host runtime -> vqvdb_tpu/native/libvqvdb_native.so
set -e
cd "$(dirname "$0")"
mkdir -p ../vqvdb_tpu/native
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    vqvdb_native.cpp -o ../vqvdb_tpu/native/libvqvdb_native.so
echo "built vqvdb_tpu/native/libvqvdb_native.so"

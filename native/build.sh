#!/bin/sh
# Build the native host-side library (loaded via ctypes with NumPy fallback).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o libgpd_native.so pcd_native.cpp
echo "built native/libgpd_native.so"

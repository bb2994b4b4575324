#!/bin/sh
# Build the native host-side libraries.
#   libgpd_native.so — host accelerators (ascii parse, LZF, voxel filter),
#                      loaded via ctypes with NumPy fallback.
#   libgpd_tpu_c.so  — the C ABI binding (gpd_tpu.h): embeds CPython and
#                      drives the detection pipeline for C/C++ callers.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o libgpd_native.so pcd_native.cpp
echo "built native/libgpd_native.so"

PY_INC=$(python3-config --includes 2>/dev/null | awk '{print $1}' | sed 's/^-I//')
if [ -n "$PY_INC" ] && [ -f "$PY_INC/Python.h" ]; then
    PY_LIBDIR=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('LIBDIR'))")
    PY_VER=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('LDVERSION'))")
    g++ -O3 -fPIC -shared -std=c++17 \
        -I"$PY_INC" -L"$PY_LIBDIR" -Wl,-rpath,"$PY_LIBDIR" \
        -o libgpd_tpu_c.so gpd_c_api.cpp "-lpython$PY_VER"
    echo "built native/libgpd_tpu_c.so"
else
    echo "Python.h not found; skipping libgpd_tpu_c.so"
fi

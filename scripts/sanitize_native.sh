#!/usr/bin/env bash
# Sanitizer pass over the native runtime's threaded paths (VERDICT r3
# #7). Builds asgart_native.cpp + sanitize_driver.cpp as standalone
# binaries with ThreadSanitizer and AddressSanitizer+UBSan, and runs the
# driver (which also asserts threaded == single-threaded results).
#
# Usage: scripts/sanitize_native.sh   (exits nonzero on any finding)
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=asgart_tpu/native/src
OUT=$(mktemp -d)
trap 'rm -rf "$OUT"' EXIT

echo "== ThreadSanitizer =="
g++ -O1 -g -std=c++17 -fsanitize=thread -fno-omit-frame-pointer \
    "$SRC/asgart_native.cpp" "$SRC/sanitize_driver.cpp" \
    -o "$OUT/tsan_driver" -lpthread
TSAN_OPTIONS="halt_on_error=1" "$OUT/tsan_driver"

echo "== AddressSanitizer + UBSan =="
g++ -O1 -g -std=c++17 -fsanitize=address,undefined \
    -fno-omit-frame-pointer \
    "$SRC/asgart_native.cpp" "$SRC/sanitize_driver.cpp" \
    -o "$OUT/asan_driver" -lpthread
ASAN_OPTIONS="detect_leaks=1" \
UBSAN_OPTIONS="halt_on_error=1 print_stacktrace=1" "$OUT/asan_driver"

echo "sanitize_native: TSan + ASan/UBSan clean"

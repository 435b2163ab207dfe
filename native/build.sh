#!/bin/bash
# Build the native front-end shared library: build/libbwfe.so
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
python "$REPO/tools/gen_tables.py"
mkdir -p "$REPO/build"
g++ -O3 -fPIC -shared -std=c++17 -Wall \
    -o "$REPO/build/libbwfe.so" "$REPO/native/src/frontend.cpp"
echo "built $REPO/build/libbwfe.so"

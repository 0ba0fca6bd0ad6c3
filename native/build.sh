#!/bin/sh
# Build the native runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -march=native -fwrapv -o liba2rt.so a2rt.cpp -lm
echo "built native/liba2rt.so"

#!/bin/sh
# Build the native helpers next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -o libmmio.so mmio.cpp
echo "built $(pwd)/libmmio.so"

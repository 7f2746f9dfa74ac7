#!/bin/sh
# Build the native helpers next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -o libmmio.so mmio.cpp
g++ -O3 -fopenmp -shared -fPIC -o libpell.so pell_encode.cpp
echo "built $(pwd)/libmmio.so $(pwd)/libpell.so"

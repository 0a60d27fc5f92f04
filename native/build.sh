#!/bin/sh
# Build the native graphcore library.  Called automatically on first import
# of bliss_gnn_tpu.graph.native (or run manually).
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -march=native -shared -fPIC -std=c++17 \
    -o libgraphcore.so graphcore.cpp
echo "built $(pwd)/libgraphcore.so"

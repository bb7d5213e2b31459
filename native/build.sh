#!/bin/sh
# Build the native runtime components into shared libraries next to the
# sources. Invoked automatically on first import (collab/codec.py) when
# the .so is missing and a compiler is available; safe to re-run.
set -e
cd "$(dirname "$0")"
CXX=${CXX:-g++}
$CXX -O3 -std=c++17 -shared -fPIC -Wall -Wextra \
    -o libmo3codec.so mo3_codec.cpp -lz
echo "built libmo3codec.so"

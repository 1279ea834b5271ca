#!/bin/sh
# Build the FFmpeg-based test oracle (tests/golden/av_oracle.cc).
# Test-only: the package itself never links FFmpeg.
set -e
cd "$(dirname "$0")/.."
g++ -O2 -fPIC -shared -o tests/golden/_av_oracle.so \
    tests/golden/av_oracle.cc \
    -I/usr/include/x86_64-linux-gnu \
    -lavformat -lavcodec -lavutil
echo "built tests/golden/_av_oracle.so"

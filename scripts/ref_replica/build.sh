#!/usr/bin/env bash
# Build the reference replica harness against /root/reference (read-only).
# Usage: build.sh [workdir]   (default /tmp/refharness)
set -euo pipefail
REF=${REF:-/root/reference}
WORK=${1:-/tmp/refharness}
HERE=$(cd "$(dirname "$0")" && pwd)
EIGEN=${EIGEN:-/opt/venv/lib/python3.12/site-packages/tensorflow/include}
CV=${CV:-/usr/include/opencv4}
mkdir -p "$WORK/obj"
SRCS=("$HERE/main.cpp" "$HERE/onnx_stub.cpp"
      "$REF"/src/tracker.cpp "$REF"/src/trackers/*.cpp
      "$REF"/src/motion/kalman_filter.cpp
      "$REF"/src/motion/kalman_filters/*.cpp
      "$REF"/src/motion/cmc/*.cpp "$REF"/src/utils/*.cpp
      "$REF"/src/appearance/reid_backend.cpp)
for s in "${SRCS[@]}"; do
  o="$WORK/obj/$(basename "$s" .cpp).o"
  [ -f "$o" ] && [ "$o" -nt "$s" ] && continue
  echo "CXX $s"
  g++ -O2 -std=c++17 -I"$REF/include" -I"$EIGEN" -I"$CV" -c "$s" -o "$o"
done
g++ "$WORK"/obj/*.o -lopencv_core -lopencv_imgproc -lopencv_video \
    -lopencv_calib3d -lopencv_features2d -o "$WORK/refharness"
echo "built $WORK/refharness"

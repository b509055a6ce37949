#!/bin/bash
# Build the reference qmf `wals` and `bpr` binaries from /root/reference
# (read-only) out-of-tree, using the stub glog/gflags/gtest headers here.
# Used only to MEASURE the reference baseline (BASELINE.md); the reference
# repo itself is never modified.
set -euo pipefail

REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/qmf_ref_build}
HERE="$(cd "$(dirname "$0")" && pwd)"

mkdir -p "$OUT/bin"

CXX=${CXX:-g++}
CXXFLAGS="-std=c++14 -O3 -fopenmp -include cstddef -include cstdint -include string -include vector -include unordered_map -I$REF -I$HERE/stub_include"
LDFLAGS="/lib/x86_64-linux-gnu/liblapack.so.3 -lpthread"

COMMON_SRCS=(
  "$REF/qmf/Engine.cpp"
  "$REF/qmf/DatasetReader.cpp"
  "$REF/qmf/Matrix.cpp"
  "$REF/qmf/Vector.cpp"
  "$REF/qmf/utils/IdIndex.cpp"
  "$REF/qmf/utils/ThreadPool.cpp"
  "$REF/qmf/utils/Util.cpp"
  "$REF/qmf/metrics/Metrics.cpp"
  "$REF/qmf/metrics/MetricsEngine.cpp"
  "$REF/qmf/metrics/MetricsManager.cpp"
)

# globals required by the glog stub
cat > "$OUT/stub_globals.cpp" <<'EOF'
bool FLAGS_logtostderr = true;
int FLAGS_minloglevel = 0;
EOF

echo "building reference wals..."
$CXX $CXXFLAGS -o "$OUT/bin/wals" \
  "$REF/qmf/wals.cpp" "$REF/qmf/wals/WALSEngine.cpp" \
  "${COMMON_SRCS[@]}" "$OUT/stub_globals.cpp" $LDFLAGS

echo "building reference bpr..."
$CXX $CXXFLAGS -o "$OUT/bin/bpr" \
  "$REF/qmf/bpr.cpp" "$REF/qmf/bpr/BPREngine.cpp" \
  "${COMMON_SRCS[@]}" "$OUT/stub_globals.cpp" $LDFLAGS

echo "built: $OUT/bin/wals $OUT/bin/bpr"

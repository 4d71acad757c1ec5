#!/bin/sh
# Sanitizer lane: build the native layer with ASan+UBSan and run the
# native-touching tests plus a fuzz smoke under it. Analogue of the
# reference's ASan CI (tools/travis-ci/run.sh:135-139).
#
# Usage: tools/sanitize_check.sh [fuzz-seconds]
set -e
cd "$(dirname "$0")/.."
FUZZ_SECONDS=${1:-60}
OUT=${GROK_TPU_ASAN_LIB:-/tmp/libgrok_tpu_native_asan.so}

echo "== building sanitized native layer -> $OUT"
g++ -O1 -g -fPIC -shared -fopenmp -std=c++17 -ffp-contract=off \
    -fsanitize=address,undefined -fno-sanitize-recover=all \
    -o "$OUT" \
    native/t1_coder.cpp native/ht_coder.cpp native/pipeline.cpp \
    native/t2_codec.cpp native/uring_io.cpp

ASAN_LIB=$(g++ -print-file-name=libasan.so)
# LD_PRELOAD is scoped to the python invocations (preloading ASan into the
# shell's own tools swallows their output). Leak detection off: the host is
# a long-lived Python process and the interpreter's arenas swamp the report;
# ASan still catches overflow/UAF/etc., UBSan aborts on undefined behavior.
SAN_ENV="GROK_TPU_NATIVE_LIB=$OUT LD_PRELOAD=$ASAN_LIB \
ASAN_OPTIONS=detect_leaks=0,abort_on_error=1 \
UBSAN_OPTIONS=halt_on_error=1,print_stacktrace=1"

echo "== native-path tests under ASan+UBSan"
# -k 'not jax': XLA's own CPU JIT aborts under a preloaded ASan (third-party
# noise); this lane instruments and checks OUR native layer only.
env $SAN_ENV python -u -m pytest tests/test_t1.py tests/test_ht.py \
    tests/test_mq.py tests/test_codec_roundtrip.py tests/test_conformance.py \
    tests/test_robustness.py -q -k "not jax" --capture=no

echo "== decode fuzz smoke (${FUZZ_SECONDS}s) under ASan+UBSan"
env $SAN_ENV python -u tools/fuzz_decode.py --seconds "$FUZZ_SECONDS"

echo "== sanitizer lane clean"

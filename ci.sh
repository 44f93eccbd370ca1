#!/bin/sh
# Minimal in-repo CI (SURVEY.md §5 "ASan/TSan in CI"): one command, exit 0.
#
#   ./ci.sh          full suite + ASan/TSan extraction smokes (~2-4 min)
#   ./ci.sh quick    test suite only
#
# The suite runs on the 8-virtual-device CPU mesh (tests/conftest.py); the
# sanitizer passes rebuild cpp/ instrumented and re-run the extraction
# differential tests under the preloaded runtime with threaded extraction
# (IMPOP_EXTRACT_THREADS=4 exercises the batch walker's worker pool).
set -eu
cd "$(dirname "$0")"

echo "== pytest (CPU mesh) =="
python -m pytest tests/ -q

if [ "${1:-}" = "quick" ]; then
  exit 0
fi

# The sanitizer passes run tools/ci_extract_smoke.py, a jax-free driver:
# jaxlib's nanobind bindings throw C++ exceptions ASan's preloaded
# interceptors cannot handle (CHECK failed: real___cxa_throw != 0), so the
# full pytest suite cannot run sanitized — the smoke exercises every
# native entry point (per-window, range batch, threaded padded fill)
# against the Python oracle instead.
ASAN_LIB=$(gcc -print-file-name=libasan.so)
TSAN_LIB=$(gcc -print-file-name=libtsan.so)

echo "== ASan extraction smoke =="
make -C cpp asan >/dev/null
LD_PRELOAD="$ASAN_LIB" ASAN_OPTIONS=detect_leaks=0:halt_on_error=1 \
  IMPOP_EXTRACT_THREADS=4 \
  python tools/ci_extract_smoke.py

echo "== TSan extraction smoke =="
make -C cpp tsan >/dev/null
LD_PRELOAD="$TSAN_LIB" TSAN_OPTIONS=halt_on_error=1 \
  IMPOP_EXTRACT_THREADS=4 \
  python tools/ci_extract_smoke.py

# leave a production (uninstrumented) library behind
make -C cpp clean >/dev/null && make -C cpp >/dev/null

# External-tool differentials stay ARMED: tests/test_identity_parity.py
# (real `impg similarity`), tests/test_plots.py (reference R scripts) and
# tests/test_agc.py (real `agc` decode) are skipif-guarded on PATH lookups
# and already ran in the suite above — on the first host that has the
# binaries they execute with zero extra work.  Report the state loudly so
# a capable host notices.
echo "== external-tool differentials =="
for tool in impg Rscript agc; do
  if command -v "$tool" >/dev/null 2>&1; then
    echo "  $tool: FOUND — its differential tests ran un-skipped above"
  else
    echo "  $tool: not on PATH — its differential tests skipped (armed)"
  fi
done
echo "== CI OK =="

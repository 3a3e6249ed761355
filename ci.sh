#!/usr/bin/env bash
# CI pipeline (SURVEY.md §2.1 CI row — the reference used Travis/AppVeyor;
# this is the local/offline equivalent, runnable on any checkout).
set -euo pipefail
cd "$(dirname "$0")"

echo "== build oracle =="
make -C cpp

echo "== unit + interop tests (CPU, 8 virtual devices) =="
python -m pytest tests/ -q -n 4

echo "== sanitizer pass =="
make test-asan

echo "== CLI selftest =="
# oracle-only here: the device path would JIT-compile fresh shapes for the
# tiny selftest inputs (minutes over the remote-compile relay); bench.py is
# the TPU-path gate.
TPZ_FORCE_ORACLE=1 python -m tpz selftest

echo "CI OK"

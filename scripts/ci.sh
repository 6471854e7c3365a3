#!/usr/bin/env bash
# CI entry: full test suite on CPU (8 virtual devices for mesh tests).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"

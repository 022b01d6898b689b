#!/usr/bin/env bash
# Local CI gate — the analogue of the reference's two workflows
# (.github/workflows/rust.yml: cargo test --all; rust-lint.yml: fmt + clippy
# -D warnings). One command, fails on any lint finding or test failure.
set -euo pipefail
cd "$(dirname "$0")"

echo "== lint =="
python tools/lint.py

echo "== tests =="
python -m pytest tests/ -q

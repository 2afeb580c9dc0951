#!/usr/bin/env bash
# Run BOTH test tiers (pyproject.toml defaults to the fast tier only):
#   fast  — per-kernel + small-pipeline tests (default `pytest`)
#   slow  — full end-to-end SLAM runs (`pytest -m slow`)
# The soak tier (tens of minutes) stays opt-in: `pytest -m soak`.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== fast tier ==="
python -m pytest tests/ -q "$@"

echo "=== slow tier ==="
python -m pytest tests/ -q -m slow --override-ini addopts= "$@"

#!/usr/bin/env bash
# Full-model CPU build tests (deselected from the default suite).
set -e
cd "$(dirname "$0")/.."
exec python -u -m pytest tests/ -q -m slow "$@"

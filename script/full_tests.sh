#!/bin/bash
# The COMPLETE test gate: default set + compile-heavy + slow end-to-end.
# The default `pytest -q` run keeps a cheaper representative of every
# coverage class; this script runs everything (measured 73 min for the
# default+heavy set on a 1-core host, results/suite_r5_durations.log).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python -m pytest tests/ -q -m heavy
python -m pytest tests/ -q -m slow

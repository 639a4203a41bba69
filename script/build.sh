#!/usr/bin/env bash
# Reference build.sh equivalent: nothing to compile for the JAX path;
# builds the optional native helpers if a toolchain is present.
set -e
cd "$(dirname "$0")/.."
python -c "import zkcnn_tpu; print('zkcnn_tpu', zkcnn_tpu.__version__, 'ready')"
if command -v g++ >/dev/null; then
  python native/build.py || echo "native helpers skipped (pure-python fallback active)"
fi

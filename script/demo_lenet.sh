#!/usr/bin/env bash
# Mirror of the reference script/demo_lenet.sh: run the LeNet5 demo with
# pic_cnt=1. Uses --synthetic because the reference's data.tar.gz is
# absent upstream; pass real csv paths to match the reference exactly:
#   demo_lenet.sh <input.csv> <config.csv> <output.txt> [pic_cnt]
set -e
cd "$(dirname "$0")/.."
if [ $# -ge 3 ]; then
  python -m zkcnn_tpu.cli.demo_lenet "$1" "$2" "$3" "${4:-1}"
else
  python -m zkcnn_tpu.cli.demo_lenet --synthetic --pic-cnt "${1:-1}"
fi

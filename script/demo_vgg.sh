#!/usr/bin/env bash
# Mirror of the reference script/demo_vgg.sh (vgg11 CIFAR, pic_cnt=1).
set -e
cd "$(dirname "$0")/.."
if [ $# -ge 4 ]; then
  python -m zkcnn_tpu.cli.demo_vgg "$1" "$2" "$3" --network "$4" "${5:-1}"
else
  python -m zkcnn_tpu.cli.demo_vgg --synthetic --model "${MODEL:-vgg11}" --pic-cnt "${1:-1}"
fi

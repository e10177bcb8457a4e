#!/usr/bin/env bash
# Multi-chip launch (reference: example/run_parallel.sh).
#
# The reference launches torchrun --nproc_per_node=2 with xDiT degrees;
# on TPU there is one process per host and the mesh spans the slice's
# chips automatically.  Without a multi-chip slice, validate the sharded
# graph on a virtual CPU mesh:
set -e
cd "$(dirname "$0")/.."

: "${DEVICES:=8}"
SAGE_CPU_DEVICES="${DEVICES}" \
python examples/parallel_video.py \
    --model cogvideox-2b \
    --ring_degree "${RING_DEGREE:-2}" \
    --ulysses_degree "${ULYSSES_DEGREE:-2}" \
    --cfg_parallel \
    --scale "${SCALE:-0.15}" \
    --smoke \
    "$@"

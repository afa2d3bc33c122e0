#!/bin/sh
# Round-5 TPU measurement queue: waits for the flagship training process,
# then runs (in priority order) the flagship gate rows, the gelu_tanh A/B
# bench, the default-headline bench, the segmented-compile cold-wall
# measurement, and a profiled train_bench for the backward-soup trace.
# Each stage logs to /tmp so a crash in one never blocks the next.
set -x
RUN=${1:-/tmp/pcdiff_flagship_runs/run_20-08-2026_21-03}
cd /root/repo || exit 1
while kill -0 "$(cat /tmp/flagship_train.pid)" 2>/dev/null; do sleep 30; done

# Trace first (short): the backward-soup analysis can then proceed on the
# host while the long gate run owns the chip.
python scripts/train_bench.py --profile=/tmp/trace_r5 > /tmp/train_bench_r5.log 2>&1

python scripts/trained_gates.py "$RUN" configs/flagship_shapes.yaml \
  /tmp/pcdiff_flagship_test.h5 \
  --only=baseline,bf16,reuse-32,gi-reuse,bf16-gi-reuse,bf16-gi-reuse-32,bf16-gi-reuse-scan,bf16-gi-reuse-gelutanh,ema-baseline,ema-bf16-gi-reuse \
  --dest=docs/trained_gates_flagship.json > /tmp/gates_flagship.log 2>&1

PCDIFF_BENCH_GELU=tanh python bench.py > /tmp/bench_gelutanh.log 2>&1
python bench.py > /tmp/bench_default_r5.log 2>&1
PCDIFF_BENCH_SEGCOMPILE=1 python bench.py > /tmp/bench_segcompile.log 2>&1
echo QUEUE_DONE

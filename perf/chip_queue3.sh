#!/bin/bash
# Round-3 chip queue #3: packed bf16 training-step configs.
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
cd /root/repo

echo "=== 0. health check ==="
timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024)); print('TUNNEL_OK', float((x@x).sum()))" || exit 1

echo "=== 1. packed train b32 (no remat) ==="
OCTSEG_BENCH_PACKED=1 OCTSEG_BENCH_BATCH=32 timeout 1800 \
  python -u perf/train_bench.py 2>&1 | grep -E "ms/step|Error|RESOURCE" | tail -3

echo "=== 2. packed train b32 (block remat) ==="
OCTSEG_BENCH_PACKED=1 OCTSEG_PACKED_REMAT=1 OCTSEG_BENCH_BATCH=32 timeout 1800 \
  python -u perf/train_bench.py 2>&1 | grep -E "ms/step|Error|RESOURCE" | tail -3

echo "=== 3. packed train b16 tg sweep ==="
for tg in 16 32; do
  OCTSEG_BENCH_PACKED=1 OCTSEG_PACKED_TG=$tg OCTSEG_BENCH_BATCH=16 timeout 1800 \
    python -u perf/train_bench.py 2>&1 | grep "ms/step" | sed "s/^/tg=$tg /"
done

echo "=== 4. packed train b16 trace ==="
OCTSEG_BENCH_PACKED=1 OCTSEG_BENCH_BATCH=16 OCTSEG_TRACE=1 timeout 1800 \
  python -u perf/train_bench.py 2>&1 | grep -v WARNING | tail -40

echo "=== DONE ==="

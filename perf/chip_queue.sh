#!/bin/bash
# Serialized chip work queue (tunnel-recovery batch). One job at a time.
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
cd /root/repo

echo "=== 0. health check ==="
timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024)); print('TUNNEL_OK', float((x@x).sum()))" || exit 1

echo "=== 1. doubled-config A/B (main event) ==="
OCTSEG_PSRP_DOUBLE=1 timeout 1800 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -3

echo "=== 2. doubled-config tg sweep (coarse) ==="
for tg in 8 16 32; do
  OCTSEG_PSRP_DOUBLE=1 OCTSEG_PSRP_TG="blk0_conv1=$tg,blk1_conv0=$tg,blk1_conv1=$tg,blk7_conv0=$tg,blk7_conv1=$tg,blk8_conv0=$tg,blk8_conv1=$tg" \
    timeout 1800 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -1 | sed "s/^/tg=$tg /"
done

echo "=== 2b. doubled-config on-chip accuracy contract ==="
OCTSEG_PSRP_DOUBLE=1 timeout 1800 python -u perf/psrp_accuracy.py 2>&1 | grep -v WARNING | tail -4

echo "=== 3. f=16 serving bench ==="
OCTSEG_BENCH_F=16 JAX_TRACEBACK_FILTERING=off timeout 1800 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -5

echo "=== 4. einsum transpose-conv training A/B (b16) ==="
OCTSEG_CONV_TRANSPOSE_IMPL=einsum OCTSEG_BENCH_BATCH=16 timeout 1500 python -u perf/train_bench.py 2>&1 | grep "ms/step"

echo "=== 5. scoped-vmem flag sweep, train b32 ==="
for kib in 32768 65536 98304; do
  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=$kib" OCTSEG_BENCH_BATCH=32 \
    timeout 1500 python -u perf/train_bench.py 2>&1 | grep "ms/step" | sed "s/^/vmem=$kib /"
done

echo "=== 6. train b24 (between b16's 10.5 and b32's 11.2 ms/img) ==="
OCTSEG_BENCH_BATCH=24 timeout 1500 python -u perf/train_bench.py 2>&1 | grep "ms/step"

echo "=== DONE ==="

#!/bin/bash
# Round-3 chip queue #2 (post doubled-config verdict). One job at a time.
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
cd /root/repo

echo "=== 0. health check ==="
timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,1024)); print('TUNNEL_OK', float((x@x).sum()))" || exit 1

echo "=== 1. stem/head-fusion A/B (new default vs round-3 baseline) ==="
timeout 1800 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -1 | sed 's/^/both-fused   /'
OCTSEG_PSRP_NO_HEAD_FUSE=1 timeout 1800 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -1 | sed 's/^/stem-only    /'
OCTSEG_PSRP_NO_STEM_FUSE=1 timeout 1800 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -1 | sed 's/^/head-only    /'
OCTSEG_PSRP_NO_HEAD_FUSE=1 OCTSEG_PSRP_NO_STEM_FUSE=1 timeout 1800 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -1 | sed 's/^/none(r3-base)/'

echo "=== 2. f=16 serving bench ==="
OCTSEG_BENCH_F=16 JAX_TRACEBACK_FILTERING=off timeout 1800 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -6

echo "=== 3. einsum transpose-conv training A/B (b16) ==="
OCTSEG_CONV_TRANSPOSE_IMPL=einsum OCTSEG_BENCH_BATCH=16 timeout 1500 python -u perf/train_bench.py 2>&1 | grep "ms/step"

echo "=== 4. scoped-vmem flag sweep, train b32 ==="
for kib in 32768 65536 98304; do
  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=$kib" OCTSEG_BENCH_BATCH=32 \
    timeout 1500 python -u perf/train_bench.py 2>&1 | grep "ms/step" | sed "s/^/vmem=$kib /"
done

echo "=== 5. train b24 (between b16's 10.5 and b32's 11.2 ms/img) ==="
OCTSEG_BENCH_BATCH=24 timeout 1500 python -u perf/train_bench.py 2>&1 | grep "ms/step"

echo "=== 6. accuracy contract refresh (fused-head graph) ==="
timeout 1800 python -u perf/psrp_accuracy.py 2>&1 | grep -v WARNING | tail -4

echo "=== 7. doubled-config crash capture (record only) ==="
OCTSEG_PSRP_DOUBLE=1 JAX_TRACEBACK_FILTERING=off timeout 900 python -u perf/sbench.py psrp 2>&1 | grep -v WARNING | tail -15

echo "=== DONE ==="

#!/bin/bash
# Round-4 queued perf measurements (VERDICT r3 items 3+4), run SEQUENTIALLY
# so the shared chip's timings are never contended.  Logs to /tmp/perf_r4/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/perf_r4

echo "=== [1/5] compiled Pallas-vs-XLA gather profile ==="
timeout 2400 python scripts/profile_gather.py > /tmp/perf_r4/gather.log 2>&1
echo "gather done rc=$?"

echo "=== [2/5] GAN batch sweep, all 7 families ==="
timeout 14400 python scripts/bench_gan.py \
  --gan_types cycle_gan,gan_x2y,gan_y2x,cut_x2y,cut_y2x,dcl_gan,dcl_cycle_gan \
  --batch_sweep 32,128,512,1024 > /tmp/perf_r4/gan_sweep.log 2>&1
echo "gan sweep done rc=$?"

echo "=== [3/5] Toeplitz-generator A/B (cycle_gan) ==="
timeout 3600 python scripts/bench_gan.py --gan_types cycle_gan \
  --batch_sweep 32,512,1024 --fused_generator \
  --out GAN_BENCH_TOEPLITZ.json > /tmp/perf_r4/toeplitz.log 2>&1
echo "toeplitz done rc=$?"

echo "=== [4/5] GAN device profile ==="
timeout 1800 python scripts/capture_gan_profile.py --out /tmp/jax_gan_trace \
  > /tmp/perf_r4/gan_profile.log 2>&1
timeout 600 python scripts/analyze_profile.py /tmp/jax_gan_trace --top 30 \
  >> /tmp/perf_r4/gan_profile.log 2>&1
echo "gan profile done rc=$?"

echo "=== [5/5] XLA compiler-option sweep on bench.py ==="
for opt in \
  "xla_tpu_scoped_vmem_limit_kib=32768" \
  "xla_tpu_scoped_vmem_limit_kib=65536" \
  "xla_tpu_enable_dot_strength_reduction=false" \
  "xla_tpu_licm_size_inflation_ratio=2" \
  ; do
  echo "--- compiler_option $opt ---" >> /tmp/perf_r4/xla_sweep.log
  timeout 3600 python bench.py --compiler_option "$opt" \
    >> /tmp/perf_r4/xla_sweep.log 2>&1
  echo "rc=$?" >> /tmp/perf_r4/xla_sweep.log
done
echo "ALL DONE"

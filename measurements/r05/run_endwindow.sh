#!/usr/bin/env bash
# r05 end-of-round measurement window (runs after the ResNet run frees the
# TPU tunnel — the axon lease is single-client, so strictly sequential).
# Usage: bash measurements/r05/run_endwindow.sh [phase]
#   phase scaling : CPU scaling bench on an idle host (run FIRST, alone)
#   phase meta    : Meta-BTS logN=16 q32 on the TPU (+ stage timing)
#   phase micro   : boot_micro + roofline q32 on the TPU
set -uo pipefail
cd "$(dirname "$0")/../.."
R=measurements/r05

phase="${1:-all}"

run_scaling() {
  # idle-host requirement (VERDICT r04 item 7): run with NO concurrent TPU
  # process — the r04 numbers were invalidated by a saturated baseline
  for mode in limb bsgs batch; do
    timeout 2400 python benchmarks/scaling_bench.py --cpu --devices 8 \
      --mode "$mode" 2>&1 | tee "$R/scaling_${mode}.log"
  done
}

run_meta() {
  # --iterations 1,2: the single-pass run both re-measures warm latency +
  # precision at logN=16 (stage-timed) and seeds Meta-BTS's precision
  # argument; the Meta-BTS passes then reuse the compiled stage programs
  TPU_FHE_BOOT_STAGE_TIME=1 TPU_FHE_BOOT_KEY_SHOUP=0 \
  timeout 6000 python -u examples/bootstrap_ckks.py --q32 --logn 16 \
    --iterations 1,2 2>&1 | tee "$R/boot16_meta_q32.log"
}

run_micro() {
  timeout 3000 python -u benchmarks/boot_micro.py --logn 16 --q32 \
    2>&1 | tee "$R/boot_micro_q32.log"
  timeout 3000 python -u benchmarks/roofline.py --data-bits 29 \
    --num-data 60 --size-p 30 2>&1 | tee "$R/roofline_q32.log"
}

case "$phase" in
  scaling) run_scaling ;;
  meta)    run_meta ;;
  micro)   run_micro ;;
  all)     run_scaling; run_meta; run_micro ;;
  *) echo "usage: $0 [scaling|meta|micro|all]" >&2; exit 2 ;;
esac

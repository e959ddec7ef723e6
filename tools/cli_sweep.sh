#!/bin/bash
# Full CLI surface sweep on the current device — drives every
# subcommand end-to-end the way a user would (the round-3 "full CLI
# sweep" finding source, kept as a tool so later sessions re-run it
# after structural changes). Usage: bash tools/cli_sweep.sh [workdir]
set -u
W=${1:-/tmp/cli_sweep}
mkdir -p "$W"
cd /root/repo
CLI="python -m correrender_tpu.app.cli"
pass=0; fail=0; failed=()
run() {
  echo "--- $*"
  if timeout 900 "$@" >"$W/last.log" 2>&1; then
    pass=$((pass+1))
  else
    fail=$((fail+1)); failed+=("$*")
    echo "FAILED: $*"; tail -5 "$W/last.log"
  fi
}

# The examples fixture (128x128x32 x 100 members) — what the example
# scene state and catalog reference.
[ -f examples/linear_4x4.nc ] || python examples/make_fixture.py

D=examples/linear_4x4.nc
run $CLI info --dataset "$D"
for M in pearson spearman kendall mi_binned mi_kraskov; do
  run $CLI render --dataset "$D" --measure $M --ref 32,32,16 \
      --size 256x192 --output "$W/r_$M.png"
done
run $CLI render --dataset "$D" --measure mi_kraskov --kraskov-estimator 2 \
    --ref 32,32,16 --size 192x144 --output "$W/r_ksg2.png"
run $CLI render --dataset "$D" --measure pearson --ref 32,32,16 \
    --renderer iso_ray --iso-value 0.5 --size 256x192 \
    --output "$W/r_iso.png"
run $CLI render --dataset "$D" --measure pearson --ref 32,32,16 \
    --renderer iso_raster --iso-value 0.5 --size 192x144 \
    --output "$W/r_isoraster.png"
run $CLI render --dataset "$D" --measure pearson --ref 32,32,16 \
    --renderer slice --size 192x144 --output "$W/r_slice.png"
run $CLI render --dataset "$D" --measure pearson --ref 32,32,16 \
    --exact-dvr --outline --legend --size 192x144 \
    --output "$W/r_exact.png"
run $CLI export --dataset "$D" --measure pearson --ref 32,32,16 \
    --output "$W/field.nc"
run $CLI export --dataset "$D" --measure pearson --ref 32,32,16 \
    --output "$W/field.cvol"
run $CLI heb --dataset "$D" --downsample 8 --num-samples 8 \
    --output "$W/heb.svg"
run $CLI heb --dataset "$D" --downsample 8 --num-samples 8 \
    --sampling-method bayesian --output "$W/heb_bayes.svg"
for K in scatter matrix distribution; do
  run $CLI diagram --dataset "$D" --kind $K --output "$W/d_$K.svg"
done
run $CLI similarity --dataset "$D" --field q --field-b q
run $CLI state --load examples/scene_state.json --size 192x144 \
    --output "$W/state.png"
run $CLI state --load examples/scene_state_mixed.json --size 192x144 \
    --dock --output "$W/state_mixed.png"
run $CLI state --load examples/reference_state.json --size 192x144 \
    --output "$W/state_ref.png" --save-reference "$W/state_ref_back.json"
run $CLI mesh --dataset "$D" --iso-value 0.5 --technique snapmc \
    --output "$W/iso.obj"
run $CLI mesh --dataset "$D" --iso-value 0.5 --output "$W/iso.stl"
run $CLI sampling --test-index 1 --num-pairs 8 --output "$W/sampling.csv"
run $CLI perf --dataset "$D" --frames 3 --output "$W/perf.csv"
run $CLI flythrough --dataset "$D" --measure pearson --ref 32,32,16 \
    --frames 4 --size 192x144 --output-dir "$W/fly" \
    --video "$W/fly.avi"
run $CLI replicability --output-dir "$W/repl"
run $CLI imgmetrics "$W/r_pearson.png" "$W/r_spearman.png"

echo "=== pass=$pass fail=$fail"
for f in "${failed[@]:-}"; do [ -n "$f" ] && echo "FAILED: $f"; done
exit $fail

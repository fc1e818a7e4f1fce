#!/usr/bin/env bash
# One-command success-rate parity harness against the released reference
# checkpoints (VERDICT r2 #5; reference: README.md:79-104).
#
#   scripts/run_released_parity.sh tacorl_calvin.zip /path/to/calvin [outdir]
#
# Unpacks the zip, converts every family it contains (play_lmp / tacorl /
# cql / ril) into this framework's checkpoint format via
# scripts/convert_checkpoint.py (numerical parity of the conversion is
# pinned by tests/test_full_model_parity.py), runs the full evaluation
# preset matrix ({family} x {easy, hard, lh_easy, lh_seq_easy}) through
# scripts/evaluate.py, and writes one README-shaped results JSON.
#
# DRY_RUN=1 prints the commands instead of running them (useful to check
# the zip layout mapping before an expensive eval run).
set -euo pipefail

ZIP=${1:?usage: run_released_parity.sh <tacorl_calvin.zip> <calvin_data_dir> [outdir]}
DATA_DIR=${2:?usage: run_released_parity.sh <tacorl_calvin.zip> <calvin_data_dir> [outdir]}
OUT=${3:-runs/released_parity}
REPO=$(cd "$(dirname "$0")/.." && pwd)
RUN() { if [ "${DRY_RUN:-0}" = "1" ]; then echo "+ $*"; else "$@"; fi; }

mkdir -p "$OUT"
UNPACKED="$OUT/unpacked"
if [ ! -d "$UNPACKED" ]; then
  mkdir -p "$UNPACKED"
  # unzip runs even under DRY_RUN: the whole point of a dry run is to check
  # the zip-layout -> family mapping below, which needs the real layout
  unzip -q "$ZIP" -d "$UNPACKED"
fi

# Map released run dirs to families by directory name; each released run dir
# carries a .hydra/config.yaml (or config.yaml) + *.ckpt files
# (utils/networks.py:78-117 layout upstream).
declare -A MODULE_CFG=(
  [play_lmp]="$REPO/configs/module/play_lmp.yaml"
  [tacorl]="$REPO/configs/module/tacorl.yaml"
  [cql]="$REPO/configs/module/cql.yaml"
  [ril]="$REPO/configs/module/ril.yaml"
)
declare -A EVAL_NAME=([play_lmp]=lmp [tacorl]=tacorl [cql]=cql [ril]=ril)

find_ckpt() { # newest/last checkpoint inside a run dir
  find "$1" -name '*.ckpt' | sort | tail -1
}

find_run_dir() { # most specific directory match for a family name
  local kind=$1
  # exact (case-insensitive) dir-name match first: "tacorl" must not grab
  # the zip's root folder ("tacorl_calvin/") and then an arbitrary family's
  # checkpoint from anywhere under it
  local exact
  exact=$(find "$UNPACKED" -type d | awk -v k="$kind" \
    'tolower($0) ~ ("/" k "$")' | head -1 || true)
  if [ -n "$exact" ]; then echo "$exact"; return; fi
  # substring fallback: deepest match wins (most specific)
  find "$UNPACKED" -type d -iname "*${kind}*" \
    | awk '{print gsub("/","/"), $0}' | sort -rn | head -1 | cut -d' ' -f2- \
    || true
}

summary="$OUT/parity_results.json"
echo '{}' > "$summary"

# play_lmp first: tacorl/ril eval re-loads the converted LMP run
for kind in play_lmp tacorl cql ril; do
  run_dir=$(find_run_dir "$kind")
  if [ -z "$run_dir" ] && [ "$kind" = play_lmp ]; then
    run_dir=$(find_run_dir "lmp")
  fi
  if [ -z "$run_dir" ]; then
    echo "!! no released run dir found for $kind — skipping"
    continue
  fi
  ckpt=$(find_ckpt "$run_dir")
  [ -n "$ckpt" ] || { echo "!! no .ckpt under $run_dir"; continue; }
  conv="$OUT/converted/$kind"
  echo "== converting $kind: $ckpt -> $conv"
  RUN python "$REPO/scripts/convert_checkpoint.py" \
    --ckpt "$ckpt" --kind "$kind" \
    --module-config "${MODULE_CFG[$kind]}" --out "$conv"
  if [ "$kind" = tacorl ] || [ "$kind" = ril ]; then
    extra=("+overwrite_module_cfg.play_lmp_dir=$OUT/converted/play_lmp")
  else
    extra=()
  fi
  for protocol in easy hard lh_easy lh_seq_easy; do
    preset="${EVAL_NAME[$kind]}_${protocol}"
    echo "== evaluating $preset"
    # ${extra[@]+...}: plain "${extra[@]}" on an empty array trips set -u
    # on bash < 4.4
    RUN python "$REPO/scripts/evaluate.py" \
      "evaluation=$preset" "module_path=$conv" "data_dir=$DATA_DIR" \
      "env=calvin" "filename=$OUT/${preset}_tasks.json" \
      ${extra[@]+"${extra[@]}"}
  done
done

# Collate per-protocol task JSONs into the single README-shaped summary
RUN python - "$OUT" "$summary" <<'EOF'
import json, sys
from pathlib import Path
out, summary_path = Path(sys.argv[1]), Path(sys.argv[2])
summary = {}
for f in sorted(out.glob("*_tasks.json")):
    summary[f.stem] = json.loads(f.read_text())
summary_path.write_text(json.dumps(summary, indent=2))
print(f"wrote {summary_path} with {len(summary)} protocol results")
EOF
echo "parity run complete: $summary"

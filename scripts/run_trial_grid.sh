#!/bin/bash
# Reference ablation grid on the correlated synthetic world (VERDICT round-3
# next #2): the reference's contribution is its trial grid
# (/root/reference/trial_add_concat/, trial_x_01_prediction/,
# trial_rounding_weight/, trial_lr/, trial_classification_free/ —
# BASELINE.md rows). This driver reruns the same axes at the reference's 8k
# protocol scale (15 epochs, 8,091 images, 0.8 split, 3-draw BLEU) on the
# synthetic world, one arm at a time, each wedge-supervised as
# schedule-correct 5-epoch segments (the monolithic 15-epoch anneal,
# reproduced segment-safely). Arms land incrementally: each finished arm is
# a codec-named log under runs/trial_grid/<arm>/ plus a DONE marker, so the
# driver is idempotent — rerun it to continue after any interruption.
#
# Usage:
#   bash scripts/run_trial_grid.sh                 # all arms, in value order
#   ARMS="add xt100" bash scripts/run_trial_grid.sh
#   touch runs/trial_grid/STOP                     # finish current arm, stop
set -u
cd "$(dirname "$0")/.."

GRID_OUT=${GRID_OUT:-runs/trial_grid}
EPOCHS=${EPOCHS:-15}
SEG_EPOCHS=${SEG_EPOCHS:-5}
SEG_CAP_S=${SEG_CAP_S:-2400}   # expected 5-epoch segment ~24 min; cap at 40
BASE=${BASE:---images 8091 --train_set_ratio 0.8 --bleu_draws 3 \
  --bleu_group 64 --eval_group 16}
# Ordered by scientific contrast (reference BLEU deltas vs baseline 0.1876):
# add 0.1033, xt100 0.1575, round05 0.2193-on-combined/λ ordering,
# cfg_w1 0.1395, cosine 0.1848, logspace 0.1699/0.1643, cfg_w03 0.0759.
# train_embed + dynamic1 (round 6) cover the two reference trial axes the
# 8-arm grid skipped — their reference logs end WITHOUT BLEU lines
# (trial_train_embedding/, trial_rounding_weight/*dynamic1*), so no
# ordering claim is possible; the deliverable is a wedge-free at-scale run
# with a qualitatively sane loss trajectory. Both reference logs use a
# CONSTANT lr 1e-4 (codec lr1E-04-1E-04), matched here via --end_lr.
ARMS=${ARMS:-baseline add xt100 round05 cfg_w1 cosine logspace cfg_w03 train_embed dynamic1}

arm_flags() {
  case "$1" in
    baseline) echo "" ;;
    add)      echo "--fusion add" ;;
    xt100)    echo "--x0_predict 0" ;;
    round05)  echo "--rounding_weight 0.5" ;;
    cosine)   echo "--scheduler cosine_annealing" ;;
    logspace) echo "--scheduler logspace" ;;
    cfg_w1)   echo "--class_weight 1.0" ;;
    cfg_w03)  echo "--class_weight 0.3" ;;
    train_embed) echo "--train_embedding 1 --end_lr 1e-4" ;;
    # Quirk-ON variant of train_embed (VERDICT round-4 next #2): the
    # reference's trial_train_embedding logs were produced WITH the
    # DictTokenizer character-slice bug (CLIP-DDPM.py:184), so only this
    # arm's trajectory is apples-to-apples with the reference shape; the
    # quirk-off arm isolates what the bug costs.
    train_embed_slice) echo "--train_embedding 1 --dict_char_slice 1 --end_lr 1e-4" ;;
    dynamic1) echo "--dynamic_rounding_weight 1 --end_lr 1e-4" ;;
    *)        echo "[grid] unknown arm: $1" >&2; return 1 ;;
  esac
}

mkdir -p "$GRID_OUT"
for arm in $ARMS; do
  if [ -f "$GRID_OUT/STOP" ]; then
    echo "[grid] STOP sentinel — exiting before arm $arm"
    break
  fi
  out="$GRID_OUT/$arm"
  mkdir -p "$out"
  if [ -f "$out/DONE" ]; then
    echo "[grid] arm $arm already DONE — skipping"
    continue
  fi
  flags=$(arm_flags "$arm") || exit 2
  echo "[grid] arm $arm -> $out (extra: $flags)"
  EPOCHS=$EPOCHS SEG_EPOCHS=$SEG_EPOCHS SEG_CAP_S=$SEG_CAP_S GLOBAL_LR=1 \
  OUT="$out" EXTRA="$BASE $flags" \
    bash scripts/wedge_supervisor.sh >"$out/supervisor.log" 2>&1
  if grep -q "complete: $EPOCHS/$EPOCHS" "$out/supervisor.log"; then
    touch "$out/DONE"
    echo "[grid] arm $arm complete"
  else
    echo "[grid] arm $arm DID NOT complete (see $out/supervisor.log)"
  fi
done
echo "[grid] done: $(ls "$GRID_OUT"/*/DONE 2>/dev/null | wc -l) arms finished"

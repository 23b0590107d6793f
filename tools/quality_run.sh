#!/usr/bin/env bash
# Quality runbook: the north-star CIFAR-10 FID number, one command.
#
# The moment real data + inception weights exist in the environment, this
# reproduces the reference's flagship quality protocol (EXPERIMENTS.md:15 ->
# CIFAR-10 FID@10k ~3.x with SNDCGAN+ContraD):
#
#   DATA_DIR=data/ ./tools/quality_run.sh                # full run, 10k steps
#   STEPS=100000 ./tools/quality_run.sh                  # paper-length run
#   EMBED=moments DATASET=synthetic_32 ./tools/quality_run.sh   # dry run,
#       # weights-free (CI: tests/test_quality_run.py exercises this path)
#
# Stages: asset check -> FID reference-stats precompute -> flagship training
# with in-loop FID (mesh-sharded eval) -> FID trajectory printout.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_DIR="${DATA_DIR:-data/}"
DATASET="${DATASET:-cifar10}"
EMBED="${EMBED:-inception}"
STEPS="${STEPS:-10000}"
EVAL_EVERY="${EVAL_EVERY:-2000}"
FID_SIZE="${FID_SIZE:-10000}"
LOGROOT="${LOGROOT:-logs/quality}"
EXTRA_FLAGS="${EXTRA_FLAGS:-}"          # extra CLI flags (no --override here)
EXTRA_OVERRIDES="${EXTRA_OVERRIDES:-}"  # extra options.* overrides
export DATA_DIR

echo "== [1/5] asset check (dataset: $DATASET, embedder: $EMBED)"
if [ "$EMBED" = "inception" ]; then
    python tools/fetch_assets.py --data_dir "$DATA_DIR" \
        || { echo "asset fetch failed — need network, or pre-place the files"; exit 1; }
fi

echo "== [2/5] FID reference stats ($DATASET reference split)"
python tools/precalc_stats.py --dataset "$DATASET" --embed "$EMBED"

echo "== [3/5] flagship training: sndcgan + contrad + simclr, b512, $STEPS steps"
python train_gan.py configs/gan/cifar10/c10_b512.toml sndcgan \
    --mode contrad --aug simclr --use_warmup \
    --fid_embed "$EMBED" --evaluate_every "$EVAL_EVERY" \
    --logdir_root "$LOGROOT" \
    $EXTRA_FLAGS \
    --override options.dataset="$DATASET" options.max_steps="$STEPS" \
               options.fid_size="$FID_SIZE" $EXTRA_OVERRIDES

echo "== [4/5] FID trajectory"
# most-recently-written CSV = this run's (logdir suffixes are random, so a
# path sort could pick an older run under the same LOGROOT)
CSV=$(find "$LOGROOT" -name 'results_fid_*.csv' -printf '%T@ %p\n' | sort -g | tail -1 | cut -d' ' -f2-)
if [ -z "$CSV" ]; then echo "no FID CSV found under $LOGROOT"; exit 1; fi
echo "--- $CSV"
cat "$CSV"
BEST=$(tail -n +2 "$CSV" | awk -F, '{print $NF}' | sort -g | head -1)
echo "BEST FID@${FID_SIZE} ($EMBED embedder): $BEST"

# Final-number cross-check with the INDEPENDENT second implementation
# (third_party/torch_fid — the reference scores finals with its TF-1.x
# second stack the same way): sample PNGs from the best checkpoint, score
# the directory with both engines. Real-weights only (the torch engine has
# no moments mode). Disable with CROSSCHECK=0.
if [ "$EMBED" = "inception" ] && [ "${CROSSCHECK:-1}" = "1" ]; then
    echo "== [5/5] cross-check: both FID engines over ${FID_SIZE} sampled PNGs"
    LOGDIR=$(dirname "$CSV")
    python test_gan_sample.py "$LOGDIR" sndcgan --ckpt best \
        --n_samples "$FID_SIZE" --batch_size 500
    SAMPLES=$(find "$LOGDIR" -maxdepth 1 -type d -name 'samples_*' \
              -printf '%T@ %p\n' | sort -g | tail -1 | cut -d' ' -f2-)
    STATS=third_party/fid/${DATASET}_stats.npz
    python test_tf_inception.py "$SAMPLES" "$STATS" --n_imgs "$FID_SIZE"
    python test_tf_inception.py "$SAMPLES" "$STATS" --n_imgs "$FID_SIZE" \
        --embed torch_inception
    echo "--- engine agreement log: $LOGDIR/fid.log"
    cat "$LOGDIR/fid.log"
fi

#!/usr/bin/env bash
# Batch driver for Cloud TPU: the TPU-native analog of the reference's one-GPU
# Slurm job (batch_relit3DGW.sh:1-35 — #SBATCH --gpus=1, node-local scratch,
# partial-result rescue on failure). Cloud TPU has no Slurm; this provisions a
# queued-resource TPU VM slice, stages the dataset to VM-local disk, runs the
# full pipeline under the container, and rescues partial results even on
# failure — the same operational contract.
#
# Usage: ./batch_relit3dgw_tpu.sh <scene> [accelerator-type=v5litepod-1]
set -u

SCENE="${1:?usage: $0 <scene> [accelerator-type]}"
ACCEL="${2:-v5litepod-1}"
TPU_NAME="relit3dgw-${SCENE}-$$"
ZONE="${TPU_ZONE:-us-central1-a}"
DATA_BUCKET="${DATA_BUCKET:?set DATA_BUCKET=gs://... with <scene>/ inside}"
OUT_BUCKET="${OUT_BUCKET:?set OUT_BUCKET=gs://...}"

cleanup() {
    # Rescue partial results even on failure (batch_relit3DGW.sh:20-35 analog),
    # then release the slice (billed per-second).
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --command \
        "gsutil -m rsync -r /tmp/out ${OUT_BUCKET}/${SCENE} || true" || true
    gcloud compute tpus tpu-vm delete "$TPU_NAME" --zone "$ZONE" --quiet || true
}
trap cleanup EXIT

gcloud compute tpus tpu-vm create "$TPU_NAME" \
    --zone "$ZONE" --accelerator-type "$ACCEL" \
    --version tpu-ubuntu2204-base

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --command "
    set -e
    mkdir -p /tmp/data /tmp/out
    gsutil -m rsync -r ${DATA_BUCKET}/${SCENE} /tmp/data/${SCENE}
    sudo apt-get install -y apptainer
    apptainer run relit3dgw-tpu.sif \
        --data_root=/tmp/data --output=/tmp/out --scenes=${SCENE}
"

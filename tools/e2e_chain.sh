#!/bin/bash
# One-command E2E chain at base dims on TPU (docs/E2E_RUN_r04.md, VERDICT r3 #6):
# synthetic raw wavs -> svc_preprocessing (fabricated random-weight extractor
# checkpoints in the reference formats -> REAL loading/extraction code paths)
# -> svc_train_retrieval -> svc_trainer -> svc_export (incl. --stablehlo)
# -> svc_inference --enable-retrieval -> svc_inference_post.
#
# Usage: bash tools/e2e_chain.sh [workspace] [max_steps]
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
WS=${1:-/tmp/e2e_r4}
STEPS=${2:-60}
export PYTHONPATH=$REPO:/root/.axon_site
export SVC_XLA_CACHE=$REPO/.xla_cache
mkdir -p $WS && cd $WS
LOG=$WS/stage_times.txt
: > $LOG

stage() {  # stage <name> <cmd...>
  local name=$1; shift
  local t0=$SECONDS
  echo "== $name =="
  "$@"
  echo "$name: $((SECONDS - t0)) s" | tee -a $LOG
}

# config: base.yaml with only logging/validation cadence changed
python - <<EOF
import re
src = open("$REPO/configs/base.yaml").read()
src = src.replace("info_interval: 100", "info_interval: 10")
src = src.replace("eval_interval: 1", "eval_interval: 10")
src = src.replace("save_interval: 5", "save_interval: 10")
open("base_run.yaml", "w").write(src)
EOF

stage fabricate_checkpoints python $REPO/tools/fabricate_pretrain.py --out-dir $WS

# 24 utts x 2 speakers, 5.2-7.0 s (single whisper/hubert size bucket ->
# one compile per extractor batch program through the tunnel)
python - <<EOF
import numpy as np, os
from whisper_vits_svc_tpu.utils.audio_io import save_wav
rng = np.random.default_rng(0)
for i in range(24):
    spk = f"spk_{i % 2}"
    os.makedirs(f"dataset_raw/{spk}", exist_ok=True)
    secs = float(rng.uniform(5.2, 7.0))
    t = np.arange(int(32000 * secs)) / 32000.0
    f0 = float(rng.uniform(140, 320)) * (1 + 0.01 * np.sin(2 * np.pi * 5.5 * t))
    ph = 2 * np.pi * np.cumsum(f0) / 32000.0
    x = sum(0.5 / h * np.sin(h * ph) for h in range(1, 6))
    x = (x * (0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t)) \
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    save_wav(f"dataset_raw/{spk}/u{i:02d}.wav", x, 32000)
print("dataset_raw ready")
EOF

stage svc_preprocessing python $REPO/svc_preprocessing.py \
  --dataset-raw dataset_raw -c base_run.yaml \
  --whisper-ckpt whisper_pretrain/large-v2.pt \
  --hubert-ckpt hubert_pretrain/hubert-soft-0d54a1f4.pt \
  --crepe-ckpt crepe_pretrain/full.pth \
  --speaker-ckpt speaker_pretrain/best_model.pth.tar

stage svc_train_retrieval python $REPO/svc_train_retrieval.py \
  --base-dir data_svc --out-dir data_svc/indexes

stage svc_trainer python $REPO/svc_trainer.py -c base_run.yaml -n e2e \
  --max-steps $STEPS

CKPT=$(ls -t chkpt/e2e/*.ckpt | head -1)
stage svc_export python $REPO/svc_export.py --checkpoint $CKPT \
  --out e2e_export.ckpt --config base_run.yaml --stablehlo e2e_serving.bin

SONG=dataset_raw/spk_0/u00.wav
stage svc_inference python $REPO/svc_inference.py --config base_run.yaml \
  --model e2e_export.ckpt --spk data_svc/singer/spk_0.spk.npy --wave $SONG \
  --shift 2 --enable-retrieval \
  --retrieval-index-prefix data_svc/indexes/spk_0/ \
  --whisper-ckpt whisper_pretrain/large-v2.pt \
  --hubert-ckpt hubert_pretrain/hubert-soft-0d54a1f4.pt \
  --crepe-ckpt crepe_pretrain/full.pth

python - <<EOF
from whisper_vits_svc_tpu.utils.audio_io import load_wav, save_wav, resample
a, sr = load_wav("$SONG")
save_wav("song16k.wav", resample(a, sr, 16000), 16000)
EOF
stage svc_inference_post python $REPO/svc_inference_post.py \
  --ref song16k.wav --svc svc_out.wav --out svc_out_post.wav \
  --vad-model /root/reference/vad/assets/silero_vad.jit

python - <<EOF
import numpy as np
from scipy.io import wavfile
for f in ["svc_out.wav", "svc_out_post.wav"]:
    sr, a = wavfile.read(f)
    a = a.astype(np.float32) / 32768.0
    assert np.isfinite(a).all(), f
    print(f, sr, a.shape, "rms", round(float(np.sqrt((a**2).mean())), 4))
print("E2E CHAIN OK")
EOF
echo "---- stage times ----"; cat $LOG

#!/usr/bin/env bash
# Tiny synthetic end-to-end recipe (the yesno/rm-class smoke test):
# data gen -> egs archives -> train -> priors -> decode -> score.
# Runs in ~2 minutes on CPU:  JAX_PLATFORMS=cpu ./run.sh
set -euo pipefail

cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
stage=${stage:-0}
work=${work:-work}

if [ "$stage" -le 0 ]; then
  python make_data.py --dir "$work/data"
fi

if [ "$stage" -le 1 ]; then
  python -m kaldi_ctc_tpu.cli.prepare_egs get \
    --feats "ark:$work/data/feats.ark" --ali "ark:$work/data/ali.ark" \
    --output "ark,scp:$work/egs.ark,$work/egs.scp"
  python -m kaldi_ctc_tpu.cli.prepare_egs info --egs "ark:$work/egs.ark"
fi

if [ "$stage" -le 2 ]; then
  python -m kaldi_ctc_tpu.cli.train_ctc \
    --egs "scp:$work/egs.scp" --num-targets 6 \
    --hidden-dim 24 --num-layers 2 \
    --epochs 600 --minibatch-size 24 \
    --initial-learning-rate 1.5e-2 --final-learning-rate 1.5e-3 \
    --momentum 0.9 --dir "$work/exp" --checkpoint-period 100
fi

if [ "$stage" -le 3 ]; then
  python -m kaldi_ctc_tpu.cli.adjust_priors \
    --dir "$work/exp" --feats "ark:$work/data/feats.ark"
fi

if [ "$stage" -le 4 ]; then
  python -m kaldi_ctc_tpu.cli.decode_ctc \
    --feats "ark:$work/data/feats.ark" --dir "$work/exp" \
    --method beam --use-priors 1 --blank-threshold 1.0 \
    --text "$work/data/text" --output "$work/hyps.txt"
fi

if [ "$stage" -le 5 ]; then
  python -m kaldi_ctc_tpu.cli.generate_report --dir "$work/exp" --plot || \
    python -m kaldi_ctc_tpu.cli.generate_report --dir "$work/exp"
fi

echo "tiny recipe done; hypotheses in $work/hyps.txt"

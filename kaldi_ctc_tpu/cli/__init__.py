"""Command-line tools — the replacement for src/ctcbin/ (+ the train.sh
orchestration collapsed into a single driver).

| reference binary / script            | here                          |
|--------------------------------------|-------------------------------|
| nnet2-ctc-train-simple + train.sh    | python -m kaldi_ctc_tpu.cli.train_ctc |
| nnet2-ctc-compute-prob               | python -m kaldi_ctc_tpu.cli.compute_prob |
| nnet2-ctc-latgen-faster (greedy/beam)| python -m kaldi_ctc_tpu.cli.decode_ctc |
| nnet-ctc-get-egs/-sort/-shuffle      | the data pipeline (in-process) |
| nnet-am-average                      | python -m kaldi_ctc_tpu.cli.average_models |
| nnet-am-info                         | python -m kaldi_ctc_tpu.cli.model_info |
| compute-mfcc-feats / compute-fbank   | python -m kaldi_ctc_tpu.cli.compute_feats |
"""

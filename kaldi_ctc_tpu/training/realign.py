"""Trainer-integrated CTC realignment — the align→relabel→adjust-priors
loop the reference wires into training but leaves TODO
(``steps/ctc/train.sh:111-115``: ``if [ $realign ]... steps/nnet2/align.sh
+ steps/ctc/relabel_egs2.sh``), closed here in memory inside one
``train_ctc`` process instead of round-tripping egs archives through disk.

At a realign epoch the current model Viterbi-aligns every training
utterance through the same blank-interleaved label lattice the loss uses
(``ops.ctc.ctc_viterbi_align``), and three things happen:

- **relabel**: each utterance's label sequence is replaced by the
  run-collapse + blank-drop of its new alignment (the
  ``relabel_egs2.sh`` / nnet-ctc-relabel-egs rule).  On a feasible
  utterance this reproduces the existing sequence (a valid CTC path
  collapses back to its labels), so relabeling is a consistency
  guarantee, not churn;
- **drop infeasible utterances**: alignments fail when the (subsampled)
  frame count cannot carry the label sequence — the reference's align.sh
  likewise omits failed utterances from the next egs generation, pruning
  data the loss can only mis-train on;
- **priors**: true per-frame symbol occupancies (blank included) are
  counted from the alignments — the ``adjust_priors --frame-labels``
  estimate, replacing the flat blank≈9 init prior
  (``nnet-adjust-priors.cc:128-132``) with data.

The caller (``cli/train_ctc.py``) aggregates counts across hosts and
writes ``<dir>/priors.npy``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = ["realign_examples", "parse_realign_epochs"]


def parse_realign_epochs(spec: str) -> frozenset:
    """'2,4' → {2, 4}; '' → {} (the train.sh realign_epochs list)."""
    if not spec:
        return frozenset()
    return frozenset(int(x) for x in spec.replace(" ", ",").split(",")
                     if x)


def realign_examples(
    examples: List,                     # List[CtcExample], raw-rate feats
    params,
    cfg,
    frame_subsampling_factor: int = 1,
    minibatch_size: int = 16,
    log=None,
) -> Tuple[List, np.ndarray, dict]:
    """→ (kept_examples (original order, relabeled), frame_counts
    [num_targets] float64, stats).

    Alignment runs at subsample shift 0 (the shift egs generation
    centers on, get_egs2.sh); labels are shift-invariant since they are
    sequences, not frame vectors.
    """
    import jax
    import jax.numpy as jnp

    from kaldi_ctc_tpu.data.bucketing import make_buckets, pad_batch
    from kaldi_ctc_tpu.data.egs import CtcExample, frame_subsample
    from kaldi_ctc_tpu.models import am_forward
    from kaldi_ctc_tpu.ops.ctc import ctc_viterbi_align

    @jax.jit
    def align(feats, input_lens, labels, label_lens):
        logits = am_forward(params, feats, cfg, input_lens=input_lens)
        out_lens = cfg.output_lens(input_lens)
        return ctc_viterbi_align(logits, labels, out_lens, label_lens)

    subs = [CtcExample(e.key,
                       frame_subsample(e.feats, frame_subsampling_factor),
                       e.labels)
            for e in examples]
    order = sorted(range(len(subs)), key=lambda i: subs[i].num_frames)

    frame_buckets = make_buckets()
    label_buckets = make_buckets(min_len=8, max_len=640, growth=1.5)
    counts = np.zeros(cfg.num_targets, np.float64)
    counts_by_key: dict = {}
    new_labels: dict = {}
    dropped: List[str] = []
    tot_lp = tot_frames = 0.0
    for i in range(0, len(order), minibatch_size):
        idx = order[i:i + minibatch_size]
        group = [subs[j] for j in idx]
        batch = pad_batch(group, frame_buckets, label_buckets)
        frame_labels, lp, ok = align(
            jnp.asarray(batch["feats"]), jnp.asarray(batch["input_lens"]),
            jnp.asarray(batch["labels"]), jnp.asarray(batch["label_lens"]))
        frame_labels = np.asarray(frame_labels)
        ok = np.asarray(ok)
        lp = np.asarray(lp)
        out_lens = np.asarray(cfg.output_lens(batch["input_lens"]))
        for row, j in enumerate(idx):
            t = int(out_lens[row])
            if not ok[row]:
                dropped.append(subs[j].key)
                continue
            fl = frame_labels[row, :t]
            c = np.bincount(fl, minlength=cfg.num_targets)[
                :cfg.num_targets].astype(np.float64)
            counts += c
            counts_by_key[subs[j].key] = c
            # relabel rule: run-collapse + blank-drop (valid CTC paths
            # separate repeated labels with a blank, so runs == labels)
            runs = fl[np.concatenate([[True], np.diff(fl) != 0])]
            new_labels[j] = runs[runs != 0].astype(np.int32)
            tot_lp += float(lp[row])
            tot_frames += t

    kept = [CtcExample(e.key, e.feats, new_labels[j])
            for j, e in enumerate(examples) if j in new_labels]
    stats = {
        "aligned": len(kept), "dropped": len(dropped),
        "dropped_keys": dropped[:8],
        # per-utterance occupancies, so a caller that truncates the kept
        # list (multi-host equal-shard rule) can re-sum over survivors
        "counts_by_key": counts_by_key,
        "avg_logprob_per_frame": tot_lp / tot_frames if tot_frames else 0.0,
    }
    if log is not None:
        log.info("realigned %d utterances (%d dropped as infeasible), "
                 "avg path logprob/frame %.4f", stats["aligned"],
                 stats["dropped"], stats["avg_logprob_per_frame"])
    return kept, counts, stats

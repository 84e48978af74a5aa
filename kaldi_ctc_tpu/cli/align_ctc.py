"""CTC forced alignment — the realignment surface of the reference
(``steps/nnet2/align.sh`` + ``steps/ctc/relabel_egs2.sh``; wired but
left TODO in ``steps/ctc/train.sh:111-115``), done the CTC-native way:
the batched Viterbi best path through the same blank-interleaved label
lattice the loss uses (no training-graph compilation, no GMM).

Inputs: features (``--feats`` [+ cmvn] or ``--egs``) and label
sequences — either existing GMM-style per-frame alignments (``--ali``,
collapsed exactly like the egs pipeline: ali-to-pdf --shift=1
--unique=true) or already-collapsed shifted label sequences
(``--labels``).

Outputs:
- ``--frame-labels``: per-output-frame symbol ids in the model's output
  space (0 = blank) — consumable by ``prepare_egs relabel
  --frame-labels 1`` to close the realign→relabel loop, and by
  ``adjust_priors --ali ... --frame-labels 1`` for data-driven priors;
- ``--ctm``: label timings (utt channel start dur label), one row per
  emitted label instance, at the logit frame rate.

Prints one JSON summary line (aligned/failed counts, mean path
log-prob per frame).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def parse_args(argv=None):
    from kaldi_ctc_tpu.utils.options import expand_config_args
    argv = expand_config_args(argv)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feats", default=None)
    p.add_argument("--egs", default=None,
                   help="egs archive (labels come from the egs)")
    p.add_argument("--ali", default=None,
                   help="GMM-style alignments; collapsed+shifted like "
                        "the egs pipeline")
    p.add_argument("--labels", default=None,
                   help="already collapsed+shifted label sequences")
    p.add_argument("--cmvn", default=None)
    p.add_argument("--utt2spk", default=None)
    p.add_argument("--dir", default=None)
    p.add_argument("--model", default=None, help="inference artifact (.npz)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--frame-labels", default=None,
                   help="wspecifier for per-frame symbol ids")
    p.add_argument("--ctm", default=None,
                   help="file for label timings ('-' = stdout)")
    p.add_argument("--frame-shift", type=float, default=0.01,
                   help="seconds per *input* frame before subsampling")
    p.add_argument("--frame-subsampling-factor", type=int, default=1)
    p.add_argument("--minibatch-size", type=int, default=16)
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from kaldi_ctc_tpu.data import CtcExample, frame_subsample, pad_batch
    from kaldi_ctc_tpu.data.bucketing import make_buckets
    from kaldi_ctc_tpu.data.egs import collapse_alignment
    from kaldi_ctc_tpu.features.cmvn import apply_cmvn
    from kaldi_ctc_tpu.models import am_forward
    from kaldi_ctc_tpu.ops.ctc import ctc_viterbi_align
    from kaldi_ctc_tpu.utils import get_logger
    from kaldi_ctc_tpu.utils.kaldi_io import (
        IntVectorWriter, SequentialIntVectorReader, SequentialMatrixReader,
        SequentialTextReader, open_random_access_matrices)

    args = parse_args(argv)
    log = get_logger("align_ctc")
    if not args.frame_labels and not args.ctm:
        log.error("need --frame-labels and/or --ctm"); sys.exit(1)

    from kaldi_ctc_tpu.models.artifact import load_acoustic_model
    try:
        params, cfg, _, _ = load_acoustic_model(args.model, args.dir,
                                                args.step)
    except ValueError as e:
        log.error("%s", e); sys.exit(1)

    # label sequences
    label_seqs = {}
    if args.ali:
        for key, ali in SequentialIntVectorReader(args.ali):
            label_seqs[key] = collapse_alignment(np.asarray(ali))
    elif args.labels:
        for key, seq in SequentialIntVectorReader(args.labels):
            label_seqs[key] = np.asarray(seq, np.int32)

    egs = []
    if args.egs:
        from kaldi_ctc_tpu.data.egs_io import SequentialEgsReader
        for e in SequentialEgsReader(args.egs):
            feats = frame_subsample(e.feats,
                                    args.frame_subsampling_factor)
            labels = label_seqs.get(e.key, e.labels)
            egs.append(CtcExample(e.key, feats, np.asarray(labels,
                                                           np.int32)))
    elif args.feats:
        if not label_seqs:
            log.error("--feats needs --ali or --labels"); sys.exit(1)
        utt2spk = (dict(SequentialTextReader(args.utt2spk))
                   if args.utt2spk else None)
        cmvn = open_random_access_matrices(args.cmvn) if args.cmvn else None
        missing = 0
        for key, feats in SequentialMatrixReader(args.feats):
            if key not in label_seqs:
                missing += 1
                continue
            if cmvn is not None:
                spk = utt2spk.get(key, key) if utt2spk else key
                if spk in cmvn:
                    feats = np.asarray(apply_cmvn(feats, cmvn[spk]))
            feats = frame_subsample(np.asarray(feats, np.float32),
                                    args.frame_subsampling_factor)
            egs.append(CtcExample(key, feats, label_seqs[key]))
        if missing:
            log.warning("%d utterances had no labels; skipped", missing)
    else:
        log.error("need --feats or --egs"); sys.exit(1)

    # range-check labels before the jitted gather clamps them silently
    # (the adjust_priors guard: out-of-range ids mean the wrong input
    # kind — e.g. transition-ids or unshifted labels — and aligning
    # against a clamped column would write corrupt alignments)
    kept = []
    n_oor = 0
    for e in egs:
        labs = np.asarray(e.labels)
        if labs.size and (labs.min() < 1 or labs.max() >= cfg.num_targets):
            if n_oor == 0:
                log.warning(
                    "%s: label ids outside [1, %d) (unshifted labels or "
                    "transition-ids?) — utterance skipped", e.key,
                    cfg.num_targets)
            n_oor += 1
            continue
        kept.append(e)
    if n_oor:
        log.warning("skipped %d utterances with out-of-range labels",
                    n_oor)
    egs = kept
    # length-sorted groups: homogeneous pads, bounded recompiles
    egs.sort(key=lambda e: e.num_frames)

    @jax.jit
    def align(feats, input_lens, labels, label_lens):
        logits = am_forward(params, feats, cfg, input_lens=input_lens)
        out_lens = cfg.output_lens(input_lens)
        return ctc_viterbi_align(logits, labels, out_lens, label_lens)

    # seconds per logit frame (input shift × subsampling × conv stride)
    sec = args.frame_shift * args.frame_subsampling_factor * cfg.time_stride

    frame_buckets = make_buckets()
    label_buckets = make_buckets(min_len=8, max_len=640, growth=1.5)
    n_ok = n_bad = 0
    tot_lp = tot_frames = 0.0
    fw = IntVectorWriter(args.frame_labels) if args.frame_labels else None
    ctm = (sys.stdout if args.ctm == "-" else
           open(args.ctm, "w")) if args.ctm else None
    try:
        for i in range(0, len(egs), args.minibatch_size):
            group = egs[i:i + args.minibatch_size]
            batch = pad_batch(group, frame_buckets, label_buckets)
            frame_labels, lp, ok = align(
                jnp.asarray(batch["feats"]),
                jnp.asarray(batch["input_lens"]),
                jnp.asarray(batch["labels"]),
                jnp.asarray(batch["label_lens"]))
            frame_labels = np.asarray(frame_labels)
            lp = np.asarray(lp)
            ok = np.asarray(ok)
            out_lens = np.asarray(
                cfg.output_lens(batch["input_lens"]))
            for j, e in enumerate(group):
                t = int(out_lens[j])
                if not ok[j]:
                    n_bad += 1
                    log.warning("alignment failed for %s (too few "
                                "frames for the label sequence)", e.key)
                    continue
                n_ok += 1
                tot_lp += float(lp[j])
                tot_frames += t
                fl = frame_labels[j, :t]
                if fw is not None:
                    fw[e.key] = fl.astype(np.int32)
                if ctm is not None:
                    # one row per maximal run of a non-blank symbol
                    # (repeated labels always have a blank between them
                    # on a valid CTC path, so runs == label instances)
                    change = np.flatnonzero(np.diff(fl) != 0) + 1
                    starts = np.concatenate([[0], change])
                    ends = np.concatenate([change, [t]])
                    for s, en in zip(starts, ends):
                        if fl[s] != 0:
                            ctm.write(f"{e.key} 1 {s * sec:.3f} "
                                      f"{(en - s) * sec:.3f} "
                                      f"{int(fl[s])}\n")
    finally:
        if fw is not None:
            fw.close()
        if ctm is not None and ctm is not sys.stdout:
            ctm.close()
    print(json.dumps({
        "aligned": n_ok, "failed": n_bad,
        "avg_logprob_per_frame": (tot_lp / tot_frames
                                  if tot_frames else 0.0)}))
    log.info("aligned %d utterances (%d failed)", n_ok, n_bad)


if __name__ == "__main__":
    main()

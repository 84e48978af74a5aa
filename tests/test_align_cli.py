"""align_ctc CLI end-to-end: train a tiny model, force-align, and close
the realign → relabel → priors loop (the steps/nnet2/align.sh +
relabel_egs2.sh flow the reference leaves TODO in train.sh:111-115).
"""

import io
import contextlib
import json
import os

import numpy as np
import pytest

from kaldi_ctc_tpu.utils import kaldi_io

from tests.test_cli_e2e import _make_dataset, NUM_TARGETS


@pytest.mark.slow
def test_align_relabel_priors(tmp_path):
    from kaldi_ctc_tpu.cli import (
        adjust_priors, align_ctc, prepare_egs, train_ctc)

    fark, aark, text = _make_dataset(tmp_path)
    exp = str(tmp_path / "exp")
    train_ctc.main([
        "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--num-targets", str(NUM_TARGETS),
        "--hidden-dim", "24", "--num-layers", "2",
        "--epochs", "300", "--minibatch-size", "16",
        "--initial-learning-rate", "3e-2", "--final-learning-rate", "3e-3",
        "--momentum", "0.9",
        "--dir", exp, "--checkpoint-period", "100",
    ])

    # force-align against the training labels
    fl_path = str(tmp_path / "frame_labels.ark")
    ctm_path = str(tmp_path / "ali.ctm")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        align_ctc.main([
            "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
            "--dir", exp,
            "--frame-labels", f"ark:{fl_path}",
            "--ctm", ctm_path, "--minibatch-size", "8",
        ])
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["failed"] == 0 and summary["aligned"] == 16

    # each utterance's frame labels collapse back to its label sequence
    # and (on this synthetic data) track the painted spans closely
    refs = {}
    for line in open(text):
        parts = line.split()
        refs[parts[0]] = [int(x) for x in parts[1:]]
    ali_in = dict(kaldi_io.SequentialIntVectorReader(f"ark:{aark}"))
    n_checked = 0
    for key, fl in kaldi_io.SequentialIntVectorReader(f"ark:{fl_path}"):
        fl = np.asarray(fl)
        assert fl.shape[0] == len(ali_in[key])
        seq, prev = [], -1
        for x in fl:
            if x != prev and x != 0:
                seq.append(int(x))
            prev = x
        assert seq == refs[key], (key, seq, refs[key])
        # CTC alignments are peaky: at least one frame per label
        # (possibly exactly one), never more frames than the utterance
        assert len(seq) <= np.count_nonzero(fl) <= fl.shape[0]
        n_checked += 1
    assert n_checked == 16

    # CTM rows exist, are ordered, and name the right labels per utt
    rows = [l.split() for l in open(ctm_path)]
    assert rows and all(len(r) == 5 for r in rows)
    by_utt = {}
    for utt, _ch, start, dur, lab in rows:
        by_utt.setdefault(utt, []).append((float(start), int(lab)))
    for utt, items in by_utt.items():
        assert [lab for _s, lab in items] == refs[utt]
        starts = [s for s, _ in items]
        assert starts == sorted(starts)

    # relabel egs from the new frame labels → label sequences unchanged
    egs_path = str(tmp_path / "egs.ark")
    prepare_egs.main([
        "get", "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--output", f"ark:{egs_path}",
    ])
    relabeled = str(tmp_path / "egs_re.ark")
    prepare_egs.main([
        "relabel", "--egs", f"ark:{egs_path}",
        "--ali", f"ark:{fl_path}", "--frame-labels", "1",
        "--output", f"ark:{relabeled}",
    ])
    from kaldi_ctc_tpu.data.egs_io import SequentialEgsReader
    n = 0
    for eg in SequentialEgsReader(f"ark:{relabeled}"):
        assert list(eg.labels) == refs[eg.key]
        n += 1
    assert n == 16

    # frame-occupancy priors from the alignment
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        adjust_priors.main([
            "--dir", exp, "--ali", f"ark:{fl_path}",
            "--frame-labels", "1",
        ])
    priors = np.load(os.path.join(exp, "priors.npy"))
    assert priors.shape == (NUM_TARGETS,)
    assert abs(float(priors[1:].sum() + priors[0]) - 1.0) < 1e-3
    # blank got the true (modest) occupancy, not the one-per-label rule
    assert 0.0 < priors[0] < 0.9

"""Hard-recipe tooling: corpus generator invariants + WER bootstrap CI.

The recipe itself runs on chip (recipes/hard/run.sh, tracked in README);
these tests pin the host-side pieces — feasibility floor, determinism,
diagnostic monotonicity, and the CI scorer's edge cases.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARD = os.path.join(REPO, "recipes", "hard")


def _gen(tmp, **kw):
    args = [sys.executable, os.path.join(HARD, "make_data.py"),
            "--out", str(tmp), "--train-utts", "6", "--test-utts", "2"]
    for k, v in kw.items():
        args += [f"--{k.replace('_', '-')}", str(v)]
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    out = subprocess.run(args, capture_output=True, text=True, env=env,
                         check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_feasibility_floor(tmp_path):
    """Every generated utterance satisfies the subsampled 2L+1 bound."""
    from kaldi_ctc_tpu.utils.kaldi_io import (
        SequentialIntVectorReader, SequentialMatrixReader)
    _gen(tmp_path, fs_factor=3, min_sub_ratio=2.4, rate_var=0.6)
    alis = dict(SequentialIntVectorReader(
        f"ark:{tmp_path}/train/ali.ark"))
    for key, feats in SequentialMatrixReader(
            f"ark:{tmp_path}/train/feats.ark"):
        ali = alis[key]
        assert feats.shape[0] == len(ali)
        # collapsed label count
        labs = 1 + int(np.sum(np.diff(ali) != 0))
        t_sub = -(-feats.shape[0] // 3)
        assert t_sub >= 2 * labs + 1, (key, t_sub, labs)


def test_determinism(tmp_path):
    a = _gen(tmp_path / "a", seed=5)
    b = _gen(tmp_path / "b", seed=5)
    assert a == b
    fa = open(tmp_path / "a" / "train" / "feats.ark", "rb").read()
    fb = open(tmp_path / "b" / "train" / "feats.ark", "rb").read()
    assert fa == fb


def test_diagnostic_tracks_difficulty(tmp_path):
    easy = _gen(tmp_path / "easy", noise=0.2, artic=0.1)
    hard = _gen(tmp_path / "hard", noise=0.7, artic=0.5)
    assert easy["frame_acc_nearest"] > hard["frame_acc_nearest"]


def _ci(tmp_path, ref_lines, hyp_lines):
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("\n".join(ref_lines) + "\n")
    hyp.write_text("\n".join(hyp_lines) + "\n")
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, os.path.join(HARD, "wer_ci.py"),
         str(ref), str(hyp), "200"],
        capture_output=True, text=True, env=env, check=True)
    return json.loads(out.stdout.strip())


def test_wer_ci_perfect(tmp_path):
    r = _ci(tmp_path, ["u1 a b c", "u2 d e"], ["u1 a b c", "u2 d e"])
    assert r["wer"] == 0.0 and r["ci95"] == [0.0, 0.0]
    assert r["n_ref_tokens"] == 5


def test_wer_ci_missing_hyp_counts_as_deletions(tmp_path):
    r = _ci(tmp_path, ["u1 a b", "u2 c d"], ["u1 a b"])
    assert r["missing_hyps"] == 1
    assert r["wer"] == pytest.approx(50.0)


def test_wer_ci_interval_brackets_point(tmp_path):
    refs = [f"u{i} a b c d" for i in range(30)]
    hyps = [f"u{i} a b c d" if i % 3 else f"u{i} a x c d"
            for i in range(30)]
    r = _ci(tmp_path, refs, hyps)
    assert r["ci95"][0] <= r["wer"] <= r["ci95"][1]
    assert r["ci95"][0] < r["ci95"][1]

"""feat_tool subcommands: streaming correctness vs direct computation."""

import subprocess
import sys

import numpy as np

from kaldi_ctc_tpu.cli import feat_tool
from kaldi_ctc_tpu.features.cmvn import acc_cmvn_stats, apply_cmvn
from kaldi_ctc_tpu.features.functions import add_deltas, splice_frames
from kaldi_ctc_tpu.utils import kaldi_io


def _write(tmp_path, name, mats):
    with kaldi_io.MatrixWriter(f"ark:{tmp_path}/{name}") as w:
        for k, m in mats.items():
            w[k] = m


def _read(tmp_path, name):
    return dict(kaldi_io.SequentialMatrixReader(f"ark:{tmp_path}/{name}"))


def test_copy_subsample_splice_deltas_select(tmp_path):
    rng = np.random.default_rng(0)
    mats = {f"u{i}": rng.standard_normal((10 + i, 6)).astype(np.float32)
            for i in range(3)}
    _write(tmp_path, "in.ark", mats)
    base = ["--feats", f"ark:{tmp_path}/in.ark"]

    feat_tool.main(["copy"] + base + ["--output",
                                      f"ark:{tmp_path}/c.ark",
                                      "--compress", "1"])
    out = _read(tmp_path, "c.ark")
    for k in mats:
        np.testing.assert_allclose(out[k], mats[k], atol=2e-2)

    feat_tool.main(["subsample"] + base + ["--n", "3", "--output",
                                           f"ark:{tmp_path}/s.ark"])
    out = _read(tmp_path, "s.ark")
    for k in mats:
        np.testing.assert_allclose(out[k], mats[k][::3])

    feat_tool.main(["splice"] + base + ["--left-context", "1",
                                        "--right-context", "2",
                                        "--output",
                                        f"ark:{tmp_path}/sp.ark"])
    out = _read(tmp_path, "sp.ark")
    for k in mats:
        np.testing.assert_allclose(
            out[k], np.asarray(splice_frames(mats[k], 1, 2)), rtol=1e-5)

    feat_tool.main(["deltas"] + base + ["--output",
                                        f"ark:{tmp_path}/d.ark"])
    out = _read(tmp_path, "d.ark")
    for k in mats:
        np.testing.assert_allclose(
            out[k], np.asarray(add_deltas(mats[k])), rtol=1e-4,
            atol=1e-5)

    feat_tool.main(["select"] + base + ["--range", "2-4", "--output",
                                        f"ark:{tmp_path}/sel.ark"])
    out = _read(tmp_path, "sel.ark")
    for k in mats:
        np.testing.assert_allclose(out[k], mats[k][:, 2:5])


def test_paste_and_to_dim(tmp_path):
    rng = np.random.default_rng(1)
    a = {f"u{i}": rng.standard_normal((8, 3)).astype(np.float32)
         for i in range(2)}
    b = {f"u{i}": rng.standard_normal((8 + i, 2)).astype(np.float32)
         for i in range(2)}
    _write(tmp_path, "a.ark", a)
    _write(tmp_path, "b.ark", b)
    feat_tool.main(["paste", "--feats", f"ark:{tmp_path}/a.ark",
                    "--feats", f"ark:{tmp_path}/b.ark",
                    "--length-tolerance", "1",
                    "--output", f"ark:{tmp_path}/p.ark"])
    out = _read(tmp_path, "p.ark")
    assert set(out) == {"u0", "u1"}
    for k in out:
        t = min(a[k].shape[0], b[k].shape[0])
        np.testing.assert_allclose(
            out[k], np.concatenate([a[k][:t], b[k][:t]], axis=1))
    r = subprocess.run(
        [sys.executable, "-m", "kaldi_ctc_tpu.cli.feat_tool", "to-dim",
         "--feats", f"ark:{tmp_path}/p.ark"],
        check=True, capture_output=True, text=True)
    assert r.stdout.strip().splitlines()[-1] == "5"


def test_transform_and_apply_cmvn(tmp_path):
    rng = np.random.default_rng(2)
    mats = {f"u{i}": rng.standard_normal((12, 4)).astype(np.float32) + i
            for i in range(2)}
    _write(tmp_path, "in.ark", mats)
    lda = rng.standard_normal((3, 4)).astype(np.float32)
    kaldi_io.write_matrix(f"{tmp_path}/lda.mat", lda)
    fmllr = rng.standard_normal((3, 4)).astype(np.float32)
    _write(tmp_path, "trans.ark", {"spk": fmllr})
    (tmp_path / "utt2spk").write_text("u0 spk\nu1 spk\n")

    feat_tool.main(["transform", "--feats", f"ark:{tmp_path}/in.ark",
                    "--matrix", f"{tmp_path}/lda.mat",
                    "--transforms", f"ark:{tmp_path}/trans.ark",
                    "--utt2spk", f"{tmp_path}/utt2spk",
                    "--output", f"ark:{tmp_path}/t.ark"])
    out = _read(tmp_path, "t.ark")
    for k in mats:
        # fmllr is [3,4] on 3-dim LDA output = affine ([A|b])
        want = (mats[k] @ lda.T) @ fmllr[:, :3].T + fmllr[:, 3]
        np.testing.assert_allclose(out[k], want, rtol=1e-4, atol=1e-4)

    with kaldi_io.MatrixWriter(f"ark:{tmp_path}/cmvn.ark") as w:
        w["spk"] = acc_cmvn_stats(np.concatenate(list(mats.values())))
    feat_tool.main(["apply-cmvn", "--feats", f"ark:{tmp_path}/in.ark",
                    "--cmvn", f"ark:{tmp_path}/cmvn.ark",
                    "--utt2spk", f"{tmp_path}/utt2spk", "--norm-vars", "1",
                    "--output", f"ark:{tmp_path}/n.ark"])
    out = _read(tmp_path, "n.ark")
    allframes = np.concatenate([out["u0"], out["u1"]])
    np.testing.assert_allclose(allframes.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(allframes.std(0), 1.0, atol=1e-3)


def test_paste_unequal_streams_errors(tmp_path):
    import pytest
    rng = np.random.default_rng(3)
    a = {f"u{i}": rng.standard_normal((5, 2)).astype(np.float32)
         for i in range(3)}
    b = {f"u{i}": rng.standard_normal((5, 2)).astype(np.float32)
         for i in range(2)}        # one utterance short
    _write(tmp_path, "a.ark", a)
    _write(tmp_path, "b.ark", b)
    with pytest.raises(SystemExit):
        feat_tool.main(["paste", "--feats", f"ark:{tmp_path}/a.ark",
                        "--feats", f"ark:{tmp_path}/b.ark",
                        "--output", f"ark:{tmp_path}/p.ark"])


def test_subsample_negative_repeats_frames(tmp_path):
    """subsample-feats --n=-P repeats each frame P times
    (featbin/subsample-feats.cc:37-55)."""
    rng = np.random.default_rng(4)
    mats = {"u0": rng.standard_normal((3, 2)).astype(np.float32)}
    _write(tmp_path, "in.ark", mats)
    feat_tool.main(["subsample", "--feats", f"ark:{tmp_path}/in.ark",
                    "--n", "-3", "--output", f"ark:{tmp_path}/r.ark"])
    out = _read(tmp_path, "r.ark")
    np.testing.assert_array_equal(out["u0"],
                                  np.repeat(mats["u0"], 3, axis=0))

    import pytest
    with pytest.raises(SystemExit):
        feat_tool.main(["subsample", "--feats", f"ark:{tmp_path}/in.ark",
                        "--n", "-3", "--offset", "1",
                        "--output", f"ark:{tmp_path}/x.ark"])


def test_to_len_and_copy_ints(tmp_path, capsys):
    """feat-to-len and copy-int-vector analogues (get_egs2.sh:150,
    train.sh:498)."""
    rng = np.random.default_rng(5)
    mats = {"u0": rng.standard_normal((7, 2)).astype(np.float32),
            "u1": rng.standard_normal((3, 2)).astype(np.float32)}
    _write(tmp_path, "in.ark", mats)
    feat_tool.main(["to-len", "--feats", f"ark:{tmp_path}/in.ark"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["u0 7", "u1 3"]

    from kaldi_ctc_tpu.utils import kaldi_io
    with kaldi_io.IntVectorWriter(f"ark:{tmp_path}/a.ark") as w:
        w["u0"] = np.asarray([1, 2, 3], np.int32)
        w["u1"] = np.asarray([4], np.int32)
    # binary -> text -> binary round trip through copy-ints
    feat_tool.main(["copy-ints", "--feats", f"ark:{tmp_path}/a.ark",
                    "--output", f"ark,t:{tmp_path}/a_t.ark"])
    txt = (tmp_path / "a_t.ark").read_text()
    assert "u0 1 2 3" in txt
    feat_tool.main(["copy-ints", "--feats", f"ark,t:{tmp_path}/a_t.ark",
                    "--output", f"ark:{tmp_path}/a2.ark"])
    out2 = dict(kaldi_io.SequentialIntVectorReader(f"ark:{tmp_path}/a2.ark"))
    np.testing.assert_array_equal(out2["u0"], [1, 2, 3])
    np.testing.assert_array_equal(out2["u1"], [4])

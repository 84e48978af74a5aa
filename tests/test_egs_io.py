"""Egs archive round-trip + stream tool semantics + prepare_egs CLI."""

import json
import os

import numpy as np
import pytest

from kaldi_ctc_tpu.data.egs import CtcExample
from kaldi_ctc_tpu.data.egs_io import (
    EgsWriter,
    SequentialEgsReader,
    copy_egs,
    relabel_egs,
    shuffle_egs,
    sort_egs,
    subset_egs,
)


def _egs(n=10, seed=0, tmin=8, tmax=40):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        t = int(rng.integers(tmin, tmax))
        out.append(CtcExample(
            f"utt{i}",
            rng.standard_normal((t, 4)).astype(np.float32),
            rng.integers(1, 6, size=rng.integers(1, 4)).astype(np.int32)))
    return out


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(tmp_path, compress):
    egs = _egs()
    path = tmp_path / "egs.ark"
    with EgsWriter(f"ark:{path}", compress=compress) as w:
        for e in egs:
            w[e.key] = e
    back = list(SequentialEgsReader(f"ark:{path}"))
    assert [e.key for e in back] == [e.key for e in egs]
    for a, b in zip(egs, back):
        np.testing.assert_array_equal(a.labels, b.labels)
        tol = 0.05 if compress else 0.0   # CompressedMatrix quantization
        assert np.abs(a.feats - b.feats).max() <= tol


def test_roundtrip_scp(tmp_path):
    egs = _egs(4)
    ark, scp = tmp_path / "e.ark", tmp_path / "e.scp"
    with EgsWriter(f"ark,scp:{ark},{scp}") as w:
        for e in egs:
            w[e.key] = e
    back = list(SequentialEgsReader(f"scp:{scp}"))
    assert [e.key for e in back] == [e.key for e in egs]


def test_copy_round_robin():
    egs = _egs(7)
    split = list(copy_egs(egs, 3))
    assert [i for i, _ in split] == [0, 1, 2, 0, 1, 2, 0]


def test_sort_windowed():
    egs = _egs(20, seed=1)
    full = list(sort_egs(egs))
    assert [e.num_frames for e in full] == sorted(e.num_frames for e in egs)
    win = list(sort_egs(egs, window=5))
    assert len(win) == 20
    for k in range(0, 20, 5):
        chunk = [e.num_frames for e in win[k:k + 5]]
        assert chunk == sorted(chunk)


def test_shuffle_preserves_multiset_and_subsamples():
    egs = _egs(30, seed=2)
    out = list(shuffle_egs(egs, buffer_size=8, seed=3))
    assert sorted(e.key for e in out) == sorted(e.key for e in egs)
    assert [e.key for e in out] != [e.key for e in egs]
    sub = list(shuffle_egs(egs, buffer_size=8, seed=3,
                           frame_subsampling_factor=3, frame_shift=1))
    by_key = {e.key: e for e in egs}
    for e in sub:
        t = by_key[e.key].num_frames
        assert e.num_frames == len(range(1, t, 3)) or e.num_frames >= 1


def test_subset_and_relabel():
    egs = _egs(10)
    assert len(list(subset_egs(egs, 4))) == 4
    ali = {"utt0": np.asarray([2, 2, 3], np.int32)}
    out = list(relabel_egs(egs, ali))
    assert len(out) == 1
    np.testing.assert_array_equal(out[0].labels, [3, 4])  # collapsed, +1


def test_prepare_egs_cli(tmp_path):
    from kaldi_ctc_tpu.cli import prepare_egs
    from kaldi_ctc_tpu.utils import kaldi_io

    fark, aark = tmp_path / "feats.ark", tmp_path / "ali.ark"
    rng = np.random.default_rng(0)
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw, \
         kaldi_io.IntVectorWriter(f"ark:{aark}") as aw:
        for i in range(9):
            n_labs = 2 + i % 3
            t = n_labs * 8
            fw[f"u{i}"] = rng.standard_normal((t, 5)).astype(np.float32)
            aw[f"u{i}"] = np.repeat(
                rng.integers(0, 4, size=n_labs), 8).astype(np.int32)

    out = tmp_path / "egs.JOB.ark"
    prepare_egs.main([
        "get", "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--output", f"ark:{out}", "--num-archives", "3"])
    counts = [len(list(SequentialEgsReader(f"ark:{tmp_path}/egs.{j}.ark")))
              for j in (1, 2, 3)]
    assert sum(counts) == 9 and counts == [3, 3, 3]

    # sort -> shuffle -> subset -> info chain
    prepare_egs.main(["sort", "--egs", f"ark:{tmp_path}/egs.1.ark",
                      "--output", f"ark:{tmp_path}/sorted.ark"])
    lens = [e.num_frames
            for e in SequentialEgsReader(f"ark:{tmp_path}/sorted.ark")]
    assert lens == sorted(lens)
    prepare_egs.main(["subset", "--egs", f"ark:{tmp_path}/sorted.ark",
                      "--output", f"ark:{tmp_path}/sub.ark", "--n", "2"])
    assert len(list(SequentialEgsReader(f"ark:{tmp_path}/sub.ark"))) == 2

    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        prepare_egs.main(["info", "--egs", f"ark:{tmp_path}/sorted.ark"])
    info = json.loads(buf.getvalue())
    assert info["num_examples"] == 3 and info["dim"] == 5


def test_prepare_egs_transition_id_alignments(tmp_path):
    """--trans-model route: alignments are transition-ids (gmm-align
    output); labels must come out as collapsed pdf+1 (ali-to-pdf)."""
    import numpy as np

    from kaldi_ctc_tpu.cli import prepare_egs
    from kaldi_ctc_tpu.data.egs_io import SequentialEgsReader
    from kaldi_ctc_tpu.utils import kaldi_io
    from tests.test_transition_model import _make_mono_ctc_model

    mdl = tmp_path / "final.mdl"
    mdl.write_bytes(_make_mono_ctc_model(3).read())

    # phone p occupies tids (2p-1, 2p) (self-loop, forward); pdf = p-1
    fark, aark = tmp_path / "f.ark", tmp_path / "a.ark"
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw, \
         kaldi_io.IntVectorWriter(f"ark:{aark}") as aw:
        # phone p has tids (2p-1 self-loop, 2p forward).  Include
        # SINGLE-FRAME phones (just the forward tid) so an off-by-one in
        # the tid->pdf map cannot hide behind multi-frame spans.
        # phones: 1 (4 frames), 2 (single frame: forward tid only),
        # 3 (3 frames); 8 frames total so 2L+1 <= T holds
        ali = np.asarray([1, 1, 1, 2, 4, 5, 5, 6], np.int32)
        fw["u1"] = np.zeros((len(ali), 4), np.float32)
        aw["u1"] = ali
    out = tmp_path / "egs.ark"
    prepare_egs.main(["get", "--feats", f"ark:{fark}",
                      "--ali", f"ark:{aark}", "--trans-model", str(mdl),
                      "--output", f"ark:{out}"])
    egs = list(SequentialEgsReader(f"ark:{out}"))
    assert len(egs) == 1
    # pdfs 0,0,0,1,2,2 collapsed + shift 1 -> labels [1, 2, 3]
    assert list(egs[0].labels) == [1, 2, 3]


def test_prepare_egs_const_feat_dim(tmp_path):
    """--const-feat-dim: trailing dims replaced by their utterance mean
    (the nnet-ctc-get-egs spk_info semantics)."""
    import numpy as np

    from kaldi_ctc_tpu.cli import prepare_egs
    from kaldi_ctc_tpu.data.egs_io import SequentialEgsReader
    from kaldi_ctc_tpu.utils import kaldi_io

    fark, aark = tmp_path / "f.ark", tmp_path / "a.ark"
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((10, 6)).astype(np.float32)
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw, \
         kaldi_io.IntVectorWriter(f"ark:{aark}") as aw:
        fw["u1"] = feats
        aw["u1"] = np.asarray([0, 0, 1, 1], np.int32)
    out = tmp_path / "egs.ark"
    prepare_egs.main(["get", "--feats", f"ark:{fark}",
                      "--ali", f"ark:{aark}", "--const-feat-dim", "2",
                      "--compress", "0", "--output", f"ark:{out}"])
    egs = list(SequentialEgsReader(f"ark:{out}"))
    got = egs[0].feats
    np.testing.assert_allclose(got[:, :4], feats[:, :4], rtol=1e-5)
    want_mean = feats[:, 4:].mean(axis=0)
    for t in range(10):
        np.testing.assert_allclose(got[t, 4:], want_mean, rtol=1e-5)


def test_prepare_egs_online_ivectors(tmp_path):
    """--online-ivectors: rows repeated to frame rate (subsample-feats
    --n=-P), pasted with length tolerance P, and treated as the const
    spk_info dims (get_egs2.sh:200-211)."""
    import numpy as np

    from kaldi_ctc_tpu.cli import prepare_egs
    from kaldi_ctc_tpu.data.egs_io import SequentialEgsReader
    from kaldi_ctc_tpu.utils import kaldi_io

    fark, aark, iark = (tmp_path / n for n in
                        ("f.ark", "a.ark", "iv.ark"))
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((11, 4)).astype(np.float32)   # 11 frames
    iv = rng.standard_normal((3, 2)).astype(np.float32)       # period 5
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw, \
         kaldi_io.MatrixWriter(f"ark:{iark}") as iw, \
         kaldi_io.IntVectorWriter(f"ark:{aark}") as aw:
        fw["u1"] = feats
        iw["u1"] = iv
        aw["u1"] = np.asarray([1, 2], np.int32)
        # u2 has no ivectors: skipped with a warning, not an abort
        fw["u2"] = feats
        aw["u2"] = np.asarray([1], np.int32)
    out = tmp_path / "egs.ark"
    prepare_egs.main(["get", "--feats", f"ark:{fark}",
                      "--ali", f"ark:{aark}",
                      "--online-ivectors", f"ark:{iark}",
                      "--ivector-period", "5",
                      "--compress", "0", "--output", f"ark:{out}"])
    egs = list(SequentialEgsReader(f"ark:{out}"))
    assert [e.key for e in egs] == ["u1"]
    got = egs[0].feats
    # expanded ivectors: 3 rows x 5 = 15 frames, trimmed to 11 (tol 5)
    assert got.shape == (11, 6)
    np.testing.assert_allclose(got[:, :4], feats, rtol=1e-5)
    expanded = np.repeat(iv, 5, axis=0)[:11]
    # const spk_info pass replaces them by their utterance mean
    want_mean = expanded.mean(axis=0)
    for t in range(11):
        np.testing.assert_allclose(got[t, 4:], want_mean, rtol=1e-4)


def test_nnet_compute_from_egs(tmp_path):
    """nnet_compute --egs forwards stored egs archives (the
    nnet2-ctc-compute-from-egs surface, train.sh:485-492)."""
    import json

    import numpy as np

    from kaldi_ctc_tpu.cli import nnet_compute, prepare_egs, train_ctc
    from kaldi_ctc_tpu.utils import kaldi_io

    fark, aark = tmp_path / "f.ark", tmp_path / "a.ark"
    rng = np.random.default_rng(0)
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw, \
         kaldi_io.IntVectorWriter(f"ark:{aark}") as aw:
        for i in range(8):
            fw[f"u{i}"] = rng.standard_normal((12, 5)).astype(np.float32)
            aw[f"u{i}"] = np.asarray([0, 1], np.int32)
    exp = str(tmp_path / "exp")
    train_ctc.main(["--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
                    "--num-targets", "4", "--hidden-dim", "8",
                    "--num-layers", "1", "--epochs", "2",
                    "--minibatch-size", "8", "--dir", exp,
                    "--checkpoint-period", "1"])
    egs_path = tmp_path / "egs.ark"
    prepare_egs.main(["get", "--feats", f"ark:{fark}",
                      "--ali", f"ark:{aark}", "--compress", "0",
                      "--output", f"ark:{egs_path}"])
    out = tmp_path / "post.ark"
    nnet_compute.main(["--egs", f"ark:{egs_path}", "--dir", exp,
                       "--what", "post", "--output", f"ark:{out}"])
    posts = dict(kaldi_io.SequentialMatrixReader(f"ark:{out}"))
    assert set(posts) == {f"u{i}" for i in range(8)}
    for m in posts.values():
        assert m.shape == (12, 4)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, rtol=1e-4)

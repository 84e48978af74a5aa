"""Lattice generation, ops, and text I/O tests.

Parity invariant: the lattice best path under the search scales must
equal the Viterbi best path from decode_best_path (the lattice's 1-best
is the decoder's best path, DecodeUtteranceLatticeFasterCtc semantics).
"""

import math

import numpy as np
import pytest

from kaldi_ctc_tpu.decoding.lattice import (
    Lattice,
    LatticeWriter,
    decode_lattice,
    read_lattice_text_ark,
    write_lattice_text,
)
from kaldi_ctc_tpu.decoding.wfst import NativeFst, decode_best_path

INF = np.float32(np.inf)


def _branch_fst(cost_a=1.0, cost_b=2.0):
    """Two words from start: word 1 = labels [1,2], word 2 = labels [1,3],
    with different graph costs so paths are distinguishable."""
    arcs = [
        [0, 1, 1, 1], [1, 2, 0, 2],
        [0, 1, 2, 3], [3, 3, 0, 4],
    ]
    weights = np.asarray([cost_a, 0.0, cost_b, 0.0], np.float32)
    finals = np.full(5, INF, np.float32)
    finals[2] = finals[4] = 0.0
    return NativeFst.from_arrays(0, 5, np.asarray(arcs, np.int32),
                                 weights, finals)


def _scores(frame_labels, num_cols, good=5.0, bad=-5.0):
    s = np.full((len(frame_labels), num_cols), bad, np.float32)
    for t, lab in enumerate(frame_labels):
        s[t, lab] = good
    return s


def _idmap(n):
    return np.asarray([-1] + list(range(1, n)), np.int32)[
        : n].astype(np.int32)


def test_lattice_matches_best_path():
    fst = _branch_fst()
    ilabel_map = np.asarray([-1, 1, 2, 3], np.int32)
    # ambiguous second frame: cols 2 and 3 close
    s = np.full((2, 4), -5.0, np.float32)
    s[0, 1] = 5.0
    s[1, 2] = 4.0
    s[1, 3] = 3.9
    words_bp, align_bp, cost_bp, _ = decode_best_path(
        fst, s, ilabel_map=ilabel_map)
    lat = decode_lattice(fst, s, ilabel_map=ilabel_map, lattice_beam=50.0)
    words, align, cost = lat.best_path()
    assert list(words) == list(words_bp)
    assert list(align) == list(align_bp)
    assert abs(cost - cost_bp) < 1e-4
    # both word alternatives survive in the lattice
    assert set(lat.arc_olabel.tolist()) >= {1, 2}


def test_lattice_beam_prunes_alternative():
    fst = _branch_fst()
    ilabel_map = np.asarray([-1, 1, 2, 3], np.int32)
    s = np.full((2, 4), -5.0, np.float32)
    s[0, 1] = 5.0
    s[1, 2] = 5.0          # path A much better
    s[1, 3] = -5.0
    wide = decode_lattice(fst, s, ilabel_map=ilabel_map, lattice_beam=50.0)
    tight = decode_lattice(fst, s, ilabel_map=ilabel_map, lattice_beam=1.0)
    assert 2 in set(wide.arc_olabel.tolist())
    assert 2 not in set(tight.arc_olabel.tolist())
    assert tight.num_states < wide.num_states


def test_scale_flips_decision():
    """Acoustic prefers word 2, graph prefers word 1; sweeping the
    acoustic scale flips the best path (the LM-weight sweep mechanism)."""
    fst = _branch_fst(cost_a=0.5, cost_b=3.0)   # graph prefers word 1
    ilabel_map = np.asarray([-1, 1, 2, 3], np.int32)
    s = np.full((2, 4), -5.0, np.float32)
    s[0, 1] = 5.0
    s[1, 3] = 2.0          # acoustics prefer word 2 (label 3)
    s[1, 2] = 0.0
    lat = decode_lattice(fst, s, ilabel_map=ilabel_map, lattice_beam=100.0,
                         beam=100.0)
    w_ac, _, _ = lat.best_path(acoustic_scale=1.0, lm_scale=0.01)
    w_lm, _, _ = lat.best_path(acoustic_scale=0.01, lm_scale=1.0)
    assert list(w_ac) == [2]
    assert list(w_lm) == [1]
    # scale() then best_path(1,1) == best_path(scales)
    w_s, _, c_s = lat.scale(acoustic_scale=1.0, lm_scale=0.01).best_path()
    assert list(w_s) == [2]


def test_prune_method():
    fst = _branch_fst()
    ilabel_map = np.asarray([-1, 1, 2, 3], np.int32)
    s = np.full((2, 4), -5.0, np.float32)
    s[0, 1] = 5.0
    s[1, 2] = 5.0
    s[1, 3] = 1.0
    lat = decode_lattice(fst, s, ilabel_map=ilabel_map, lattice_beam=50.0)
    pruned = lat.prune(1.0)
    assert pruned.num_states <= lat.num_states
    w0, _, c0 = lat.best_path()
    w1, _, c1 = pruned.best_path()
    assert list(w0) == list(w1)
    assert abs(c0 - c1) < 1e-4


def test_text_roundtrip(tmp_path):
    fst = _branch_fst()
    ilabel_map = np.asarray([-1, 1, 2, 3], np.int32)
    s = np.full((2, 4), -5.0, np.float32)
    s[0, 1] = 5.0
    s[1, 2] = 4.0
    s[1, 3] = 3.0
    lat = decode_lattice(fst, s, ilabel_map=ilabel_map, lattice_beam=50.0)
    path = str(tmp_path / "lat.ark.txt")
    with LatticeWriter(path) as w:
        w["utt1"] = lat
        w["utt2"] = lat
    got = dict(read_lattice_text_ark(path))
    assert set(got) == {"utt1", "utt2"}
    back = got["utt1"]
    assert back.num_arcs == lat.num_arcs
    w0, a0, c0 = lat.best_path()
    w1, a1, c1 = back.best_path()
    assert list(w0) == list(w1)
    assert list(a0) == list(a1)
    assert abs(c0 - c1) < 1e-3


def test_lattice_through_ctc_graph():
    """End-to-end through make_ctc_graph: lattice 1-best == Viterbi."""
    arcs, weights = [], []
    num_words = 4
    for lab in range(1, num_words + 1):
        s = lab
        arcs.append([0, lab, lab, s]); weights.append(1.0)
        arcs.append([s, lab, 0, s]); weights.append(0.0)
        arcs.append([s, 0, 0, 0]); weights.append(0.0)
    finals = np.full(num_words + 1, INF, np.float32)
    finals[0] = 0.0
    base = NativeFst.from_arrays(0, num_words + 1,
                                 np.asarray(arcs, np.int32),
                                 np.asarray(weights, np.float32), finals)
    g = base.make_ctc_graph()
    rng = np.random.default_rng(0)
    scores = rng.standard_normal((20, num_words + 1)).astype(np.float32)
    words_bp, _, cost_bp, _ = decode_best_path(g, scores)
    lat = decode_lattice(g, scores, lattice_beam=20.0)
    words, _, cost = lat.best_path()
    assert list(words) == list(words_bp)
    assert abs(cost - cost_bp) < 1e-3


class TestBinaryLatticeIO:
    """Kaldi binary lattice archive round-trips + auto-detection
    (lat/kaldi-lattice.cc WriteLattice/ReadLattice binary path)."""

    def _lat(self):
        from kaldi_ctc_tpu.decoding.lattice import Lattice
        import numpy as np
        return Lattice(
            start=0, num_states=3,
            arc_from=np.asarray([0, 0, 1], np.int32),
            arc_to=np.asarray([1, 2, 2], np.int32),
            arc_ilabel=np.asarray([3, 4, 5], np.int32),
            arc_olabel=np.asarray([7, 0, 8], np.int32),
            arc_graph_cost=np.asarray([0.5, 1.25, 0.0], np.float32),
            arc_acoustic_cost=np.asarray([2.0, 0.0, 3.5], np.float32),
            final_cost=np.asarray([np.inf, np.inf, 0.75], np.float32))

    def test_round_trip(self, tmp_path):
        import numpy as np
        from kaldi_ctc_tpu.decoding.lattice_binary import (
            BinaryLatticeWriter, read_lattice_ark)
        lat = self._lat()
        path = str(tmp_path / "b.lats")
        with BinaryLatticeWriter(path) as w:
            w["u1"] = lat
            w["u2"] = lat
        got = list(read_lattice_ark(path))
        assert [k for k, _ in got] == ["u1", "u2"]
        back = got[0][1]
        np.testing.assert_array_equal(back.arc_ilabel, lat.arc_ilabel)
        np.testing.assert_array_equal(back.arc_olabel, lat.arc_olabel)
        np.testing.assert_allclose(back.arc_graph_cost, lat.arc_graph_cost)
        np.testing.assert_allclose(back.arc_acoustic_cost,
                                   lat.arc_acoustic_cost)
        np.testing.assert_allclose(back.final_cost, lat.final_cost)
        w1, a1, c1 = lat.best_path()
        w2, a2, c2 = back.best_path()
        assert list(w1) == list(w2) and abs(c1 - c2) < 1e-5

    def test_autodetect_text(self, tmp_path):
        from kaldi_ctc_tpu.decoding.lattice import LatticeWriter
        from kaldi_ctc_tpu.decoding.lattice_binary import read_lattice_ark
        path = str(tmp_path / "t.lats")
        with LatticeWriter(path) as w:
            w["u1"] = self._lat()
        got = list(read_lattice_ark(path))
        assert got[0][0] == "u1"
        assert got[0][1].num_arcs == 3

    def test_compact_round_trip(self, tmp_path):
        import numpy as np
        from kaldi_ctc_tpu.decoding.det_lattice import CompactLattice
        from kaldi_ctc_tpu.decoding.lattice_binary import (
            BinaryCompactLatticeWriter, read_compact_lattice_ark)
        INF = float("inf")
        clat = CompactLattice(
            start=0, num_states=2, arc_from=[0], arc_to=[1],
            arc_word=[5], arc_graph_cost=[0.5], arc_acoustic_cost=[1.5],
            arc_ilabels=[(2, 3, 3)], final_graph_cost=[INF, 0.25],
            final_acoustic_cost=[INF, 0.125], final_ilabels=[(), (4,)])
        path = str(tmp_path / "c.lats")
        with BinaryCompactLatticeWriter(path) as w:
            w["utt"] = clat
        key, back = next(iter(read_compact_lattice_ark(path)))
        assert key == "utt"
        assert back.arc_word == [5]
        assert back.arc_ilabels == [(2, 3, 3)]
        assert back.final_ilabels[1] == (4,)
        assert abs(back.final_graph_cost[1] - 0.25) < 1e-6
        assert abs(back.final_acoustic_cost[1] - 0.125) < 1e-6

    def test_cli_copy_binary_conversion(self, tmp_path):
        from kaldi_ctc_tpu.cli import lattice_tool
        from kaldi_ctc_tpu.decoding.lattice import LatticeWriter
        from kaldi_ctc_tpu.decoding.lattice_binary import read_lattice_ark
        text = str(tmp_path / "t.lats")
        with LatticeWriter(text) as w:
            w["u1"] = self._lat()
        binary = str(tmp_path / "b.lats")
        lattice_tool.main(["copy", "--lattices", text,
                           "--output", binary, "--binary", "1"])
        with open(binary, "rb") as f:
            head = f.read(16)
        assert head[:3] == b"u1 "
        # binary archive feeds every other subcommand transparently
        text2 = str(tmp_path / "t2.lats")
        lattice_tool.main(["copy", "--lattices", binary,
                           "--output", text2])
        got = list(read_lattice_ark(text2))
        assert got[0][0] == "u1" and got[0][1].num_arcs == 3


def test_text_reader_final_acoustic_component(tmp_path):
    """Kaldi final weights 'g,a' fold both components into final_cost
    (same convention as the binary reader)."""
    from kaldi_ctc_tpu.decoding.lattice import read_lattice_text_ark
    p = tmp_path / "l.lats"
    p.write_text("utt1\n0\t1\t2\t3\t0.5,0.25\n1\t2.5,1.2\n\n")
    (key, lat), = list(read_lattice_text_ark(str(p)))
    assert abs(float(lat.final_cost[1]) - 3.7) < 1e-6

"""Lattice determinization tests: one path per word sequence, best-cost
selection, alignment preservation, CompactLattice text round-trip."""

import itertools
import math

import numpy as np

from kaldi_ctc_tpu.decoding.det_lattice import (
    determinize_lattice,
    determinize_lattice_pruned,
    read_compact_lattice_text_ark,
    write_compact_lattice_text,
)
from kaldi_ctc_tpu.decoding.lattice import Lattice, decode_lattice
from kaldi_ctc_tpu.decoding.wfst import NativeFst

INF = np.float32(np.inf)


def _lat(arcs, finals, start=0):
    """arcs: (from, to, ilabel, olabel, g, a)."""
    n = max(max(a[0], a[1]) for a in arcs) + 1
    fc = np.full(n, np.inf, np.float32)
    for s, c in finals.items():
        fc[s] = c
    return Lattice(
        start=start, num_states=n,
        arc_from=np.asarray([a[0] for a in arcs], np.int32),
        arc_to=np.asarray([a[1] for a in arcs], np.int32),
        arc_ilabel=np.asarray([a[2] for a in arcs], np.int32),
        arc_olabel=np.asarray([a[3] for a in arcs], np.int32),
        arc_graph_cost=np.asarray([a[4] for a in arcs], np.float32),
        arc_acoustic_cost=np.asarray([a[5] for a in arcs], np.float32),
        final_cost=fc)


def _all_word_paths(clat):
    """Enumerate (word_seq, total_cost) over the compact lattice."""
    out = {}

    def walk(s, words, cost):
        if not math.isinf(clat.final_graph_cost[s]):
            seq = tuple(words)
            tot = cost + clat.final_graph_cost[s] + \
                clat.final_acoustic_cost[s]
            if seq not in out or tot < out[seq]:
                out[seq] = tot
        for i in range(clat.num_arcs):
            if clat.arc_from[i] == s:
                walk(clat.arc_to[i],
                     words + ([clat.arc_word[i]]
                              if clat.arc_word[i] else []),
                     cost + clat.arc_graph_cost[i]
                     + clat.arc_acoustic_cost[i])

    walk(clat.start, [], 0.0)
    return out


def test_duplicate_word_paths_merge():
    # two distinct state paths with the SAME word seq (1,) but costs 1, 2,
    # plus a different word seq (2,) cost 3
    arcs = [
        (0, 1, 5, 1, 1.0, 0.0),
        (0, 2, 6, 1, 2.0, 0.0),
        (0, 3, 7, 2, 3.0, 0.0),
        (1, 4, 8, 0, 0.0, 0.0),
        (2, 4, 9, 0, 0.0, 0.0),
        (3, 4, 9, 0, 0.0, 0.0),
    ]
    lat = _lat(arcs, {4: 0.0})
    clat = determinize_lattice(lat)
    paths = _all_word_paths(clat)
    assert set(paths) == {(1,), (2,)}
    assert abs(paths[(1,)] - 1.0) < 1e-4   # kept the cheaper duplicate
    assert abs(paths[(2,)] - 3.0) < 1e-4
    # determinism: no state has two outgoing arcs with the same word
    outs = {}
    for i in range(clat.num_arcs):
        key = (clat.arc_from[i], clat.arc_word[i])
        assert key not in outs, "nondeterministic output"
        outs[key] = True


def test_alignment_preserved_for_best():
    arcs = [
        (0, 1, 5, 1, 0.5, 0.0),   # best path for word 1: ilabels 5, 8
        (1, 2, 8, 0, 0.0, 0.0),
        (0, 3, 6, 1, 2.0, 0.0),   # worse duplicate: ilabels 6, 9
        (3, 2, 9, 0, 0.0, 0.0),
    ]
    lat = _lat(arcs, {2: 0.0})
    clat = determinize_lattice(lat)
    words, align, cost = clat.best_path()
    assert list(words) == [1]
    assert list(align) == [5, 8]
    assert abs(cost - 0.5) < 1e-4


def test_matches_raw_best_path_through_decoder():
    """determinize(decode_lattice(...)).best_path == raw best path."""
    arcs, weights = [], []
    for lab in range(1, 5):
        s = lab
        arcs.append([0, lab, lab, s]); weights.append(1.0)
        arcs.append([s, lab, 0, s]); weights.append(0.0)
        arcs.append([s, 0, 0, 0]); weights.append(0.0)
    finals = np.full(5, INF, np.float32)
    finals[0] = 0.0
    g = NativeFst.from_arrays(0, 5, np.asarray(arcs, np.int32),
                              np.asarray(weights, np.float32),
                              finals).make_ctc_graph()
    rng = np.random.default_rng(1)
    scores = rng.standard_normal((16, 5)).astype(np.float32)
    lat = decode_lattice(g, scores, lattice_beam=15.0)
    clat = determinize_lattice(lat, det_beam=2.0)
    w0, a0, c0 = lat.best_path()
    w1, a1, c1 = clat.best_path()
    assert list(w0) == list(w1)
    assert abs(c0 - c1) < 1e-3
    # alignment (emitting ilabels) preserved
    assert list(a0) == list(a1)


def test_compact_text_roundtrip(tmp_path):
    arcs = [
        (0, 1, 5, 1, 0.5, -0.25),
        (1, 2, 8, 0, 0.0, 0.0),
        (0, 3, 6, 2, 2.0, 1.0),
        (3, 2, 9, 0, 0.0, 0.0),
    ]
    lat = _lat(arcs, {2: 0.75})
    clat = determinize_lattice(lat)
    p = str(tmp_path / "clat.txt")
    with open(p, "w") as f:
        write_compact_lattice_text(f, "u1", clat)
        write_compact_lattice_text(f, "u2", clat)
    got = dict(read_compact_lattice_text_ark(p))
    assert set(got) == {"u1", "u2"}
    w0, a0, c0 = clat.best_path()
    w1, a1, c1 = got["u1"].best_path()
    assert list(w0) == list(w1)
    assert list(a0) == list(a1)
    assert abs(c0 - c1) < 1e-3


def test_pruned_wrapper_backoff():
    """The retry wrapper converges even where a wide beam blows up."""
    arcs, weights = [], []
    for lab in range(1, 5):
        s = lab
        arcs.append([0, lab, lab, s]); weights.append(1.0)
        arcs.append([s, lab, 0, s]); weights.append(0.0)
        arcs.append([s, 0, 0, 0]); weights.append(0.0)
    finals = np.full(5, INF, np.float32)
    finals[0] = 0.0
    g = NativeFst.from_arrays(0, 5, np.asarray(arcs, np.int32),
                              np.asarray(weights, np.float32),
                              finals).make_ctc_graph()
    rng = np.random.default_rng(1)
    scores = rng.standard_normal((16, 5)).astype(np.float32)
    lat = decode_lattice(g, scores, lattice_beam=15.0)
    clat = determinize_lattice_pruned(lat, det_beam=10.0, max_states=20000)
    w0, a0, c0 = lat.best_path()
    w1, a1, c1 = clat.best_path()
    assert list(w0) == list(w1)
    assert list(a0) == list(a1)
    assert abs(c0 - c1) < 1e-3


def test_compact_text_reader_weightless_arc(tmp_path):
    """'from to word' (implicit One weight) is an arc, not a final."""
    p = tmp_path / "c.lats"
    p.write_text("utt1\n0 1 42\n1\n\n")
    (key, lat), = list(read_compact_lattice_text_ark(str(p)))
    assert key == "utt1"
    assert lat.num_arcs == 1
    assert lat.arc_word[0] == 42
    assert lat.arc_graph_cost[0] == 0.0
    assert math.isinf(lat.final_graph_cost[0])
    assert lat.final_graph_cost[1] == 0.0


def _parity_check(lat, det_beam):
    """Native vs Python determinization must agree on the word-path set
    (with costs), the best path (words + alignment + cost), and sizes."""
    from kaldi_ctc_tpu.decoding.det_lattice import determinize_lattice_native
    py = determinize_lattice(lat, det_beam=det_beam)
    nat = determinize_lattice_native(lat, det_beam=det_beam)
    assert nat.num_states == py.num_states
    assert nat.num_arcs == py.num_arcs
    pp, pn = _all_word_paths(py), _all_word_paths(nat)
    assert set(pp) == set(pn)
    for k in pp:
        assert abs(pp[k] - pn[k]) < 1e-3, (k, pp[k], pn[k])
    w0, a0, c0 = py.best_path()
    w1, a1, c1 = nat.best_path()
    assert list(w0) == list(w1)
    assert list(a0) == list(a1)
    assert abs(c0 - c1) < 1e-3


def test_native_parity_hand_lattices():
    arcs = [
        (0, 1, 5, 1, 1.0, 0.0),
        (0, 2, 6, 1, 2.0, 0.0),
        (0, 3, 7, 2, 3.0, 0.0),
        (1, 4, 8, 0, 0.0, 0.0),
        (2, 4, 9, 0, 0.0, 0.0),
        (3, 4, 9, 0, 0.0, 0.0),
    ]
    _parity_check(_lat(arcs, {4: 0.0}), det_beam=10.0)
    arcs = [
        (0, 1, 5, 1, 0.5, -0.25),
        (1, 2, 8, 0, 0.0, 0.0),
        (0, 3, 6, 2, 2.0, 1.0),
        (3, 2, 9, 0, 0.0, 0.0),
    ]
    _parity_check(_lat(arcs, {2: 0.75}), det_beam=10.0)


def _ctc_scores(rng, frames, labels=5):
    """CTC-shaped log posteriors: blank-dominated with label spikes —
    what decode-time lattices actually see (raw N(0,1) scores make the
    word-sequence count per beam explode and test nothing realistic)."""
    post = np.full((frames, labels + 1), 1e-3, np.float32)
    post[:, 0] = 0.9
    spikes = rng.random(frames) < 0.4
    rows = np.where(spikes)[0]
    labs = rng.integers(1, labels + 1, size=rows.shape[0])
    post[rows, 0] = 0.1
    post[rows, labs] = 0.6
    # weak second-best on ~30% of spikes (cost delta ~2): keeps the det
    # output diverse without the exponential word-sequence blowup a
    # strong alternative on every spike causes at beam 10
    sel = rng.random(rows.shape[0]) < 0.3
    alt = rng.integers(1, labels + 1, size=rows.shape[0])
    post[rows[sel], alt[sel]] += 0.08
    post /= post.sum(axis=1, keepdims=True)
    return np.log(post)


def test_native_parity_decoder_lattices():
    """Decoder-produced lattices over a CTC word-loop graph with
    CTC-shaped posteriors, at several det beams."""
    arcs, weights = [], []
    for lab in range(1, 6):
        s = lab
        arcs.append([0, lab, lab, s]); weights.append(1.0)
        arcs.append([s, lab, 0, s]); weights.append(0.0)
        arcs.append([s, 0, 0, 0]); weights.append(0.0)
    finals = np.full(6, INF, np.float32)
    finals[0] = 0.0
    g = NativeFst.from_arrays(0, 6, np.asarray(arcs, np.int32),
                              np.asarray(weights, np.float32),
                              finals).make_ctc_graph()
    rng = np.random.default_rng(7)
    for trial in range(3):
        scores = _ctc_scores(rng, 40).astype(np.float32)
        lat = decode_lattice(g, scores, lattice_beam=10.0)
        # beam 10 only on the first trial: the Python side costs ~15 s
        # there (that cost is exactly why the native impl exists)
        for beam in ((2.0, 5.0, 10.0) if trial == 0 else (2.0, 5.0)):
            _parity_check(lat, det_beam=beam)


def test_native_blowup_signals_runtime_error():
    from kaldi_ctc_tpu.decoding.det_lattice import determinize_lattice_native
    arcs, weights = [], []
    for lab in range(1, 6):
        s = lab
        arcs.append([0, lab, lab, s]); weights.append(1.0)
        arcs.append([s, lab, 0, s]); weights.append(0.0)
        arcs.append([s, 0, 0, 0]); weights.append(0.0)
    finals = np.full(6, INF, np.float32)
    finals[0] = 0.0
    g = NativeFst.from_arrays(0, 6, np.asarray(arcs, np.int32),
                              np.asarray(weights, np.float32),
                              finals).make_ctc_graph()
    rng = np.random.default_rng(3)
    scores = rng.standard_normal((24, 6)).astype(np.float32)
    lat = decode_lattice(g, scores, lattice_beam=15.0)
    import pytest
    with pytest.raises(RuntimeError):
        determinize_lattice_native(lat, det_beam=15.0, max_states=3)
    # and the wrapper backs off to success with the native impl
    clat = determinize_lattice_pruned(lat, det_beam=10.0, max_states=20000,
                                      implementation="native")
    w0, _, c0 = lat.best_path()
    w1, _, c1 = clat.best_path()
    assert list(w0) == list(w1) and abs(c0 - c1) < 1e-3

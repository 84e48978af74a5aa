"""Native WFST decoder tests.

Graphs are built programmatically (linear word chains with a shared
blank-augmented CTC structure), scores are synthetic, and expected outputs
are known by construction.  Also round-trips the OpenFst binary format.
"""

import os

import numpy as np
import pytest

from kaldi_ctc_tpu.decoding.wfst import NativeFst, decode_best_path

INF = np.float32(np.inf)


def _chain_fst(labels, words=None):
    """Linear acceptor: state i --(label, word)--> i+1, last state final."""
    n = len(labels)
    arcs = []
    for i, lab in enumerate(labels):
        w = (words[i] if words else lab)
        arcs.append([i, lab, w, i + 1])
    finals = np.full(n + 1, INF, np.float32)
    finals[n] = 0.0
    return NativeFst.from_arrays(0, n + 1,
                                 np.asarray(arcs, np.int32),
                                 np.zeros(len(arcs), np.float32), finals)


def _branch_fst():
    """Start state branches to two words: word 1 = labels [1,2],
    word 2 = labels [1,3]; olabel emitted on the first arc."""
    arcs = [
        [0, 1, 1, 1], [1, 2, 0, 2],   # path A: word 1
        [0, 1, 2, 3], [3, 3, 0, 4],   # path B: word 2
    ]
    finals = np.full(5, INF, np.float32)
    finals[2] = finals[4] = 0.0
    return NativeFst.from_arrays(0, 5, np.asarray(arcs, np.int32),
                                 np.zeros(4, np.float32), finals)


def _scores(frame_labels, num_cols, good=5.0, bad=-5.0):
    s = np.full((len(frame_labels), num_cols), bad, np.float32)
    for t, lab in enumerate(frame_labels):
        s[t, lab] = good
    return s


def test_build_and_counts():
    fst = _chain_fst([1, 2, 3])
    assert fst.num_states == 4
    assert fst.num_arcs == 3
    assert fst.start == 0


def test_write_load_roundtrip(tmp_path):
    fst = _chain_fst([1, 2, 3])
    p = str(tmp_path / "g.fst")
    fst.write(p)
    fst2 = NativeFst.load(p)
    assert fst2.num_states == fst.num_states
    assert fst2.num_arcs == fst.num_arcs
    assert fst2.start == fst.start


def test_decode_linear_chain():
    # graph labels 1..3 map to score columns 0..2 by default (CTC shift);
    # here use an identity-ish map instead
    fst = _chain_fst([1, 2, 3])
    ilabel_map = np.asarray([-1, 1, 2, 3], np.int32)  # ilabel i -> col i
    scores = _scores([1, 2, 3], num_cols=4)
    words, align, cost, final = decode_best_path(
        fst, scores, ilabel_map=ilabel_map)
    assert list(words) == [1, 2, 3]
    assert list(align) == [1, 2, 3]
    assert final


def test_decode_picks_better_branch():
    fst = _branch_fst()
    ilabel_map = np.asarray([-1, 1, 2, 3], np.int32)
    # frames support labels [1, 3] → word 2
    words, align, _, final = decode_best_path(
        fst, _scores([1, 3], num_cols=4), ilabel_map=ilabel_map)
    assert list(words) == [2]
    assert list(align) == [1, 3]
    # frames support labels [1, 2] → word 1
    words, _, _, _ = decode_best_path(
        fst, _scores([1, 2], num_cols=4), ilabel_map=ilabel_map)
    assert list(words) == [1]


def test_ctc_graph_transform_structure():
    base = _chain_fst([1, 2])
    ctc = base.make_ctc_graph()
    # each original state gains a twin blank state
    assert ctc.num_states == 2 * base.num_states
    # arcs: original 2 arcs + per state (eps + blank loop) = 2 + 3*2
    assert ctc.num_arcs == base.num_arcs + 2 * base.num_states


def test_ctc_graph_decode_with_blanks():
    """After the transform, graph ilabels are label+1 and blank=1; the CTC
    scores (blank = column 0) map via the default ilabel_map."""
    base = _chain_fst([1, 2])     # labels 1,2 (as pdf+1 style already)
    ctc = base.make_ctc_graph()   # ilabels now 2,3; blank ilabel 1
    # scores over columns: 0=blank, 1=label1, 2=label2
    frames = [0, 1, 0, 0, 2, 0]   # blank, l1, blank, blank, l2, blank
    scores = _scores(frames, num_cols=3)
    words, align, cost, final = decode_best_path(ctc, scores)
    assert list(words) == [1, 2]
    # alignment covers every frame; blanks have ilabel 1
    assert len(align) == len(frames)
    assert [a for a in align if a != 1] == [2, 3]
    assert final


def test_ctc_graph_repeated_label_needs_blank():
    base = _chain_fst([1, 1])     # label 1 twice
    ctc = base.make_ctc_graph()
    # must pass through blank between repeats: frames l1, blank, l1
    scores = _scores([1, 0, 1], num_cols=2)
    words, align, _, final = decode_best_path(ctc, scores)
    assert list(words) == [1, 1]
    assert list(align) == [2, 1, 2]


def test_self_loop_handling():
    """Self-loops stay on the original state after the transform
    (ctc-graph.cc keeps them there) and can emit repeatedly."""
    arcs = [[0, 1, 1, 0],   # self-loop label 1
            [0, 2, 2, 1]]   # leave with label 2
    finals = np.asarray([INF, 0.0], np.float32)
    base = NativeFst.from_arrays(0, 2, np.asarray(arcs, np.int32),
                                 np.zeros(2, np.float32), finals)
    ctc = base.make_ctc_graph()
    # frames: l1 l1 l2 → loop twice then leave (graph ilabels 2,2,3)
    scores = _scores([1, 1, 2], num_cols=3)
    words, align, _, _ = decode_best_path(ctc, scores)
    assert list(align) == [2, 2, 3]
    assert list(words) == [1, 1, 2]


def test_beam_pruning_still_finds_path():
    fst = _chain_fst(list(range(1, 9)))
    ilabel_map = np.concatenate([[-1], np.arange(1, 10)]).astype(np.int32)
    scores = _scores(list(range(1, 9)), num_cols=10)
    words, _, _, _ = decode_best_path(fst, scores, ilabel_map=ilabel_map,
                                      beam=4.0, max_active=4)
    assert list(words) == list(range(1, 9))


def test_decode_failure_on_impossible():
    fst = _chain_fst([1])
    ilabel_map = np.asarray([-1, 5], np.int32)  # label maps past num_cols
    with pytest.raises(RuntimeError):
        decode_best_path(fst, _scores([0], num_cols=2),
                         ilabel_map=ilabel_map)


def test_batch_decode_matches_single():
    from kaldi_ctc_tpu.decoding.wfst import decode_best_path_batch
    fst = _chain_fst([1, 2, 3])
    ilabel_map = np.asarray([-1, 1, 2, 3], np.int32)
    rng = np.random.default_rng(5)
    scores_list = []
    for _ in range(3):   # chain consumes exactly 3 frames; vary the noise
        s = _scores([1, 2, 3], num_cols=4)
        scores_list.append(s + rng.standard_normal(s.shape).astype(
            np.float32) * 0.1)
    singles = [decode_best_path(fst, s, ilabel_map=ilabel_map)
               for s in scores_list]
    batched = decode_best_path_batch(fst, scores_list,
                                     ilabel_map=ilabel_map, num_threads=2)
    for (w0, a0, c0, f0), (w1, a1, c1, ok) in zip(singles, batched):
        assert ok
        assert list(w0) == list(w1)
        assert list(a0) == list(a1)
        assert abs(c0 - c1) < 1e-5


def test_arch_stamp_mismatch_forces_real_rebuild(tmp_path, monkeypatch):
    """A .so copied from another machine with preserved mtimes must be
    rebuilt when the arch stamp mismatches — plain `make` would no-op on
    mtimes, so ensure_built has to delete the binary first (ADVICE r1)."""
    from kaldi_ctc_tpu.decoding import wfst

    native = tmp_path / "native"
    native.mkdir()
    lib = tmp_path / "libfake.so"
    # Fake sources older than the target, and a Makefile whose rule is
    # mtime-based exactly like the real one.
    for name in ("fst.cc", "determinize.cc", "decoder.cc", "lattice.cc",
                 "api.cc", "fst.h", "decoder.h", "lattice.h"):
        (native / name).write_text("// fake\n")
    (native / "Makefile").write_text(
        f"{lib}: fst.cc determinize.cc decoder.cc lattice.cc api.cc\n"
        f"\tprintf built-%s $$$$ > {lib}\n")
    lib.write_text("foreign-binary")
    old = lib.read_text()
    os.utime(lib, (2e9, 2e9))  # newer than every source
    # Forged stamp from a different host.
    (tmp_path / "libfake.so.buildinfo").write_text("other-arch:deadbeef\n")

    monkeypatch.setattr(wfst, "_LIB_PATH", str(lib))
    monkeypatch.setattr(wfst, "_NATIVE_DIR", str(native))
    wfst.ensure_built()
    assert lib.read_text() != old, "foreign binary survived stamp mismatch"
    assert (tmp_path / "libfake.so.buildinfo").read_text().strip() == \
        wfst._host_arch_stamp()
    # Second call: stamp now matches, mtimes fresh -> no rebuild.
    now = lib.read_text()
    wfst.ensure_built()
    assert lib.read_text() == now

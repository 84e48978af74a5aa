"""lattice-align-words-lexicon analogue: every output arc carries exactly
one word with exactly its frames; path language and weights preserved."""

import math
import subprocess
import sys

import numpy as np
import pytest

from kaldi_ctc_tpu.decoding.det_lattice import (
    CompactLattice, read_compact_lattice_text_ark,
    write_compact_lattice_text)
from kaldi_ctc_tpu.decoding.word_align import (
    AlignError, word_align_lattice_lexicon)

INF = float("inf")


def _clat(arcs, finals, start=0):
    n = max(max(a[0], a[1]) for a in arcs) + 1
    fg, fa, fi = [INF] * n, [0.0] * n, [()] * n
    for s, (g, a, il) in finals.items():
        fg[s], fa[s], fi[s] = g, a, tuple(il)
    return CompactLattice(
        start=start, num_states=n,
        arc_from=[a[0] for a in arcs], arc_to=[a[1] for a in arcs],
        arc_word=[a[2] for a in arcs],
        arc_graph_cost=[float(a[3]) for a in arcs],
        arc_acoustic_cost=[float(a[4]) for a in arcs],
        arc_ilabels=[tuple(a[5]) for a in arcs],
        final_graph_cost=fg, final_acoustic_cost=fa, final_ilabels=fi)


def _all_paths(clat, keep_sil=False):
    """{(word_seq, full string): best total cost}."""
    out = {}
    adj = {}
    for i in range(clat.num_arcs):
        adj.setdefault(clat.arc_from[i], []).append(i)

    def walk(s, words, string, cost):
        if not math.isinf(clat.final_graph_cost[s]):
            key = (tuple(words), tuple(string) + clat.final_ilabels[s])
            tot = cost + clat.final_graph_cost[s] + \
                clat.final_acoustic_cost[s]
            if key not in out or tot < out[key]:
                out[key] = tot
        for i in adj.get(s, []):
            w = clat.arc_word[i]
            walk(clat.arc_to[i],
                 words + ([w] if (w or keep_sil) else []),
                 string + list(clat.arc_ilabels[i]),
                 cost + clat.arc_graph_cost[i] + clat.arc_acoustic_cost[i])

    walk(clat.start, [], [], 0.0)
    return out


# unit-mode lexicon: graph label = phone + 1, blank = 1
PRONS = {10: [(2, 3)], 11: [(4,)], 12: [(2,), (2, 3)], 13: [(2, 2)]}


def test_single_path_segmentation():
    # blanks at edges and between words become silence (word 0) arcs
    arcs = [
        (0, 1, 10, 1.0, 2.0, (1, 1, 3, 3, 4, 1)),
        (1, 2, 11, 0.5, 0.25, (5, 5)),
    ]
    clat = _clat(arcs, {2: (0.125, 0.0625, (1,))})
    out = word_align_lattice_lexicon(clat, PRONS)
    # one linear path: sil(1,1) w10(3,3,4) sil(1) w11(5,5) sil(1)
    paths = _all_paths(out, keep_sil=True)
    assert len(paths) == 1
    (words, string), cost = next(iter(paths.items()))
    assert words == (0, 10, 0, 11, 0)
    assert string == (1, 1, 3, 3, 4, 1, 5, 5, 1)
    assert abs(cost - (1 + 2 + 0.5 + 0.25 + 0.125 + 0.0625)) < 1e-6
    # each word arc carries exactly its own frames
    segs = {out.arc_word[i]: out.arc_ilabels[i]
            for i in range(out.num_arcs)}
    assert segs[10] == (3, 3, 4)
    assert segs[11] == (5, 5)


def test_repeated_phone_interior_blank_stays_with_word():
    # word 13 = phones (2, 2): CTC needs the separating blank inside
    arcs = [(0, 1, 13, 0.0, 0.0, (3, 3, 1, 3))]
    clat = _clat(arcs, {1: (0.0, 0.0, ())})
    out = word_align_lattice_lexicon(clat, PRONS)
    segs = [out.arc_ilabels[i] for i in range(out.num_arcs)
            if out.arc_word[i] == 13]
    assert segs == [(3, 3, 1, 3)]


def test_word_label_far_from_frames():
    # determinization can leave the word label on an arc whose string
    # belongs to another word; alignment must repartition across arcs
    arcs = [
        (0, 1, 10, 1.0, 0.0, ()),            # word early, no frames
        (1, 2, 0, 0.0, 2.0, (3,)),
        (2, 3, 11, 0.0, 1.0, (3, 4, 1)),     # 10's frames + 11's word
        (3, 4, 0, 0.0, 0.5, (5,)),
    ]
    clat = _clat(arcs, {4: (0.0, 0.0, ())})
    out = word_align_lattice_lexicon(clat, PRONS)
    paths = _all_paths(out, keep_sil=True)
    assert set(paths) == {((10, 0, 11), (3, 3, 4, 1, 5))}
    assert abs(next(iter(paths.values())) - 4.5) < 1e-6
    segs = {out.arc_word[i]: out.arc_ilabels[i]
            for i in range(out.num_arcs)}
    assert segs[10] == (3, 3, 4)
    assert segs[11] == (5,)


def test_branching_preserves_language_and_cost():
    arcs = [
        (0, 1, 10, 1.0, 0.0, (3, 4, 1)),
        (0, 2, 11, 2.0, 0.0, (5, 1)),
        (1, 3, 11, 0.0, 0.5, (5,)),
        (2, 3, 11, 0.0, 0.25, (5,)),
    ]
    clat = _clat(arcs, {3: (0.0, 0.0, ())})
    out = word_align_lattice_lexicon(clat, PRONS)
    before = _all_paths(clat)
    after = _all_paths(out)
    assert set(before) == set(after)
    for k in before:
        assert abs(before[k] - after[k]) < 1e-6


def test_prefix_ambiguous_prons_both_alignments():
    # word 12 has prons (2,) and (2,3): string (3,1,4,...) only matches
    # (2,); string (3,4) only (2,3); string (3,1,3,4) with words 12,10?
    # — check the simple unambiguous cases resolve
    arcs = [(0, 1, 12, 0.0, 0.0, (3, 1))]
    clat = _clat(arcs, {1: (0.0, 0.0, ())})
    out = word_align_lattice_lexicon(clat, PRONS)
    paths = _all_paths(out, keep_sil=True)
    assert set(paths) == {((12, 0), (3, 1))}

    arcs = [(0, 1, 12, 0.0, 0.0, (3, 4))]
    clat = _clat(arcs, {1: (0.0, 0.0, ())})
    out = word_align_lattice_lexicon(clat, PRONS)
    paths = _all_paths(out, keep_sil=True)
    # the complete-pron alignment must exist; a forced-out alternative
    # (pron (2,) + partial-word arc for the dangling phone) may coexist
    assert ((12,), (3, 4)) in paths
    for words, string in paths:
        assert string == (3, 4)
        assert [w for w in words if w not in (0,)] == [12]


def test_transition_model_mode_self_loops():
    # 4 phones, 2 tids each: tid 2p-1 enters phone p, tid 2p self-loops
    tid_phone = np.zeros(9, np.int32)
    tid_selfloop = np.zeros(9, bool)
    for p in range(1, 5):
        tid_phone[2 * p - 1] = p
        tid_phone[2 * p] = p
        tid_selfloop[2 * p] = True
    # graph labels = tid + 1; word 10 = phones (2, 3):
    # phone 2 over 3 frames: tids (3, 4, 4) → labels (4, 5, 5)
    # phone 3 over 1 frame: tid 5 → label 6
    arcs = [(0, 1, 10, 0.5, 0.5, (1, 4, 5, 5, 6, 1))]
    clat = _clat(arcs, {1: (0.0, 0.0, ())})
    out = word_align_lattice_lexicon(clat, PRONS, tid_phone, tid_selfloop)
    segs = {out.arc_word[i]: out.arc_ilabels[i]
            for i in range(out.num_arcs)}
    assert segs[10] == (4, 5, 5, 6)
    # consecutive same-phone instances WITHOUT blank are two instances
    # in tid mode (re-entry tid is not a self-loop): phones (2, 2) =
    # tids (3, 4 | 3) = labels (4, 5, 4)
    arcs = [(0, 1, 13, 0.0, 0.0, (4, 5, 4))]
    clat = _clat(arcs, {1: (0.0, 0.0, ())})
    out = word_align_lattice_lexicon(clat, PRONS, tid_phone, tid_selfloop)
    segs = {out.arc_word[i]: out.arc_ilabels[i]
            for i in range(out.num_arcs)}
    assert segs[13] == (4, 5, 4)


def test_unalignable_raises():
    # phones that match no pron of the pending word, and path continues
    arcs = [(0, 1, 10, 0.0, 0.0, (6, 6)), (1, 2, 0, 0.0, 0.0, (1,))]
    clat = _clat(arcs, {2: (0.0, 0.0, ())})
    with pytest.raises(AlignError):
        word_align_lattice_lexicon(clat, PRONS, partial_word_label=0,
                                   max_states=100)


def test_cli_align_words(tmp_path):
    lat_p = tmp_path / "in.lats"
    with open(lat_p, "w") as f:
        write_compact_lattice_text(
            f, "utt1",
            _clat([(0, 1, 10, 1.0, 2.0, (1, 1, 3, 3, 4, 1)),
                   (1, 2, 11, 0.5, 0.25, (5, 5))],
                  {2: (0.125, 0.0625, (1,))}))
    (tmp_path / "lexicon.txt").write_text("ab a b\nc c\n")
    (tmp_path / "words.txt").write_text("<eps> 0\nab 10\nc 11\n")
    (tmp_path / "phones.txt").write_text("<blk> 0\nx 1\na 2\nb 3\nc 4\n")
    out_p = tmp_path / "out.lats"
    subprocess.run(
        [sys.executable, "-m", "kaldi_ctc_tpu.cli.lattice_tool",
         "align-words", "--lattices", str(lat_p), "--output", str(out_p),
         "--lexicon", str(tmp_path / "lexicon.txt"),
         "--words", str(tmp_path / "words.txt"),
         "--phones", str(tmp_path / "phones.txt")], check=True)
    (key, out), = list(read_compact_lattice_text_ark(str(out_p)))
    assert key == "utt1"
    segs = {out.arc_word[i]: out.arc_ilabels[i]
            for i in range(out.num_arcs)}
    assert segs[10] == (3, 3, 4)
    assert segs[11] == (5, 5)


def test_tid_args_must_come_together():
    clat = _clat([(0, 1, 10, 0.0, 0.0, (3,))], {1: (0.0, 0.0, ())})
    with pytest.raises(ValueError):
        word_align_lattice_lexicon(clat, PRONS,
                                   tid_phone=np.zeros(4, np.int32))

"""lattice-push / lattice-minimize analogues: path-language invariance,
string hoisting, weight pushing to One, suffix merging, CLI round-trip."""

import math
import subprocess
import sys

import numpy as np

from kaldi_ctc_tpu.decoding.det_lattice import (
    CompactLattice,
    determinize_lattice,
    read_compact_lattice_text_ark,
    write_compact_lattice_text,
)
from kaldi_ctc_tpu.decoding.lattice import Lattice
from kaldi_ctc_tpu.decoding.lattice_ops import (
    minimize_compact_lattice,
    push_compact_lattice_strings,
    push_compact_lattice_weights,
    top_sort_compact_lattice,
)

INF = float("inf")


def _clat(arcs, finals, start=0, num_states=None):
    """arcs: (from, to, word, g, a, ilabels); finals: {s: (g, a, ilabels)}."""
    n = num_states or (max(max(a[0], a[1]) for a in arcs) + 1)
    fg = [INF] * n
    fa = [0.0] * n
    fi = [()] * n
    for s, (g, a, il) in finals.items():
        fg[s], fa[s], fi[s] = g, a, tuple(il)
    return CompactLattice(
        start=start, num_states=n,
        arc_from=[a[0] for a in arcs],
        arc_to=[a[1] for a in arcs],
        arc_word=[a[2] for a in arcs],
        arc_graph_cost=[float(a[3]) for a in arcs],
        arc_acoustic_cost=[float(a[4]) for a in arcs],
        arc_ilabels=[tuple(a[5]) for a in arcs],
        final_graph_cost=fg, final_acoustic_cost=fa, final_ilabels=fi)


def _all_paths(clat):
    """{(word_seq, full_ilabel_string): best total cost} over all paths."""
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
            walk(clat.arc_to[i],
                 words + ([clat.arc_word[i]] if clat.arc_word[i] else []),
                 string + list(clat.arc_ilabels[i]),
                 cost + clat.arc_graph_cost[i] + clat.arc_acoustic_cost[i])

    walk(clat.start, [], [], 0.0)
    return out


def _paths_equal(a, b, tol=1e-4):
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < tol, (k, a[k], b[k])


def _branchy_clat():
    # start splits into two words whose strings share prefix (7, 8);
    # each then joins a common suffix with identical string (9,)
    arcs = [
        (0, 1, 10, 1.0, 0.5, (7, 8, 1)),
        (0, 2, 11, 2.0, 0.25, (7, 8, 2)),
        (1, 3, 12, 0.5, 0.0, (9,)),
        (2, 4, 12, 0.5, 0.0, (9,)),
    ]
    return _clat(arcs, {3: (0.25, 0.0, (4,)), 4: (0.25, 0.0, (4,))})


def test_push_strings_preserves_paths_and_hoists():
    clat = _branchy_clat()
    before = _all_paths(clat)
    pushed = push_compact_lattice_strings(clat)
    _paths_equal(before, _all_paths(pushed))
    # the common prefix (7, 8) moved onto... both start arcs differ at
    # position 2, so shift at start-successors: arcs out of state 1/2
    # hoist their (9,)+final(4,) strings maximally
    for i in range(pushed.num_arcs):
        if pushed.arc_from[i] == pushed.start:
            # start arcs absorbed the downstream strings fully
            assert len(pushed.arc_ilabels[i]) == 5
    # final strings now empty (hoisted)
    for s in range(pushed.num_states):
        if not math.isinf(pushed.final_graph_cost[s]):
            assert pushed.final_ilabels[s] == ()


def test_push_strings_conflict_limits_shift():
    # two continuations from state 1 that agree on one symbol then differ:
    # only the agreeing prefix may be hoisted
    arcs = [
        (0, 1, 5, 0.0, 0.0, (3,)),
        (1, 2, 6, 1.0, 0.0, (7, 1)),
        (1, 3, 7, 1.0, 0.0, (7, 2)),
    ]
    clat = _clat(arcs, {2: (0.0, 0.0, ()), 3: (0.0, 0.0, ())})
    before = _all_paths(clat)
    pushed = push_compact_lattice_strings(clat)
    _paths_equal(before, _all_paths(pushed))
    start_arc = [i for i in range(pushed.num_arcs)
                 if pushed.arc_from[i] == pushed.start][0]
    assert pushed.arc_ilabels[start_arc] == (3, 7)   # hoisted the 7 only


def test_push_weights_one_to_end():
    clat = _branchy_clat()
    before = _all_paths(clat)
    pushed = push_compact_lattice_weights(clat)
    _paths_equal(before, _all_paths(pushed))
    # every non-start state's best (graph+acoustic) weight-to-end == 0
    adj = {}
    for i in range(pushed.num_arcs):
        adj.setdefault(pushed.arc_from[i], []).append(i)
    w2e = [INF] * pushed.num_states
    for s in reversed(range(pushed.num_states)):
        best = (pushed.final_graph_cost[s] + pushed.final_acoustic_cost[s]
                if not math.isinf(pushed.final_graph_cost[s]) else INF)
        for i in adj.get(s, []):
            best = min(best, pushed.arc_graph_cost[i]
                       + pushed.arc_acoustic_cost[i]
                       + w2e[pushed.arc_to[i]])
        w2e[s] = best
    for s in range(pushed.num_states):
        if s != pushed.start and not math.isinf(w2e[s]):
            assert abs(w2e[s]) < 1e-5


def test_minimize_merges_identical_suffixes():
    clat = _branchy_clat()
    before = _all_paths(clat)
    out = minimize_compact_lattice(clat)
    _paths_equal(before, _all_paths(out))
    # states 3 and 4 (identical final suffix) merge; after push, 1 and 2
    # become final-with-empty-continuation states and also merge
    assert out.num_states < clat.num_states
    assert out.num_states <= 3


def test_minimize_no_push_exact():
    # without pushing: two branches with exactly identical suffix states
    arcs = [
        (0, 1, 10, 1.0, 0.0, (5,)),
        (0, 2, 11, 2.0, 0.0, (6,)),
        (1, 3, 20, 0.5, 0.25, (7, 7)),
        (2, 4, 20, 0.5, 0.25, (7, 7)),
    ]
    clat = _clat(arcs, {3: (0.0, 0.0, ()), 4: (0.0, 0.0, ())})
    before = _all_paths(clat)
    out = minimize_compact_lattice(clat, push=False)
    _paths_equal(before, _all_paths(out))
    # 3+4 merge (identical finals), then 1+2 merge (identical arc sets)
    assert out.num_states == 3


def test_top_sort_drops_unreachable():
    arcs = [
        (0, 2, 1, 0.0, 0.0, (1,)),
        (1, 2, 2, 0.0, 0.0, (2,)),   # state 1 unreachable
    ]
    clat = _clat(arcs, {2: (0.0, 0.0, ())})
    out = top_sort_compact_lattice(clat)
    assert out.num_states == 2
    assert out.num_arcs == 1
    for i in range(out.num_arcs):
        assert out.arc_from[i] < out.arc_to[i]


def test_push_minimize_after_determinize(tmp_path):
    # realistic route: raw lattice -> determinize -> push -> minimize,
    # word language and best path invariant throughout
    rng = np.random.default_rng(7)
    arcs = []
    finals = {9: 0.1}
    for s in range(9):
        for t in range(s + 1, min(s + 3, 10)):
            arcs.append((s, t, int(rng.integers(1, 4)),
                         int(rng.integers(0, 3)),
                         float(rng.uniform(0, 2)),
                         float(rng.uniform(0, 2))))
    lat = Lattice(
        start=0, num_states=10,
        arc_from=np.asarray([a[0] for a in arcs], np.int32),
        arc_to=np.asarray([a[1] for a in arcs], np.int32),
        arc_ilabel=np.asarray([a[2] for a in arcs], np.int32),
        arc_olabel=np.asarray([a[3] for a in arcs], np.int32),
        arc_graph_cost=np.asarray([a[4] for a in arcs], np.float32),
        arc_acoustic_cost=np.asarray([a[5] for a in arcs], np.float32),
        final_cost=np.where(np.arange(10) == 9, np.float32(0.1), INF))
    clat = determinize_lattice(lat)
    before = _all_paths(clat)
    w0, a0, c0 = clat.best_path()
    out = minimize_compact_lattice(
        push_compact_lattice_weights(push_compact_lattice_strings(clat)))
    _paths_equal(before, _all_paths(out), tol=1e-3)
    w1, a1, c1 = out.best_path()
    assert list(w0) == list(w1)
    assert list(a0) == list(a1)
    assert abs(c0 - c1) < 1e-3
    assert out.num_states <= clat.num_states

    # CLI round trip: push then minimize via lattice_tool
    src = tmp_path / "clat.txt"
    with open(src, "w") as f:
        write_compact_lattice_text(f, "utt1", clat)
    pushed_p = tmp_path / "pushed.txt"
    min_p = tmp_path / "min.txt"
    subprocess.run(
        [sys.executable, "-m", "kaldi_ctc_tpu.cli.lattice_tool", "push",
         "--lattices", str(src), "--output", str(pushed_p)], check=True)
    subprocess.run(
        [sys.executable, "-m", "kaldi_ctc_tpu.cli.lattice_tool", "minimize",
         "--lattices", str(pushed_p), "--output", str(min_p)], check=True)
    (key, got), = list(read_compact_lattice_text_ark(str(min_p)))
    assert key == "utt1"
    _paths_equal(before, _all_paths(got), tol=1e-3)

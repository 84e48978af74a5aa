"""Native decision-tree building: stats accumulation windows, question
clustering, likelihood-gain splitting, post-clustering, CLI chain, and
integration with prepare_egs --tree."""

import json
import subprocess
import sys

import numpy as np

from kaldi_ctc_tpu.utils import kaldi_io
from kaldi_ctc_tpu.utils.tree import read_tree, write_tree
from kaldi_ctc_tpu.utils.tree_build import (
    GaussStats,
    acc_tree_stats,
    build_tree,
    cluster_phones,
    load_tree_stats,
    save_tree_stats,
    sum_tree_stats,
)


def _utts(rng, n=40):
    """Phone 1's features depend on its RIGHT neighbor (2 vs 3);
    phones 2 and 3 have fixed, distinct means."""
    means = {2: np.array([4.0, 0.0]), 3: np.array([-4.0, 0.0])}
    out = []
    for i in range(n):
        nxt = 2 if i % 2 == 0 else 3
        phones = [1, 1, 1, nxt, nxt]
        mu1 = np.array([0.0, 6.0]) if nxt == 2 else np.array([0.0, -6.0])
        f = np.stack([mu1] * 3 + [means[nxt]] * 2)
        f = f + 0.1 * rng.standard_normal(f.shape)
        out.append((f.astype(np.float32), np.array(phones, np.int32)))
    return out


def test_acc_stats_windows_and_ci():
    rng = np.random.default_rng(0)
    stats = acc_tree_stats(_utts(rng, 4))
    # phone 1 at utterance start: window (0, 1, 2) or (0, 1, 3)
    evs = {e for e in stats}
    assert ((-1, 0), (0, 0), (1, 1), (2, 2)) in evs
    assert ((-1, 0), (0, 0), (1, 1), (2, 3)) in evs
    # final phone: right context 0
    assert ((-1, 0), (0, 1), (1, 2), (2, 0)) in evs
    # counts: 4 utts x 3 frames of phone 1 split between the two events
    n1 = sum(s.count for e, s in stats.items() if dict(e)[1] == 1)
    assert n1 == 12
    # ci phones get zeroed context
    stats_ci = acc_tree_stats(_utts(rng, 4), ci_phones=[1])
    for e in stats_ci:
        if dict(e)[1] == 1:
            assert dict(e)[0] == 0 and dict(e)[2] == 0


def test_sum_and_save_load(tmp_path):
    rng = np.random.default_rng(1)
    s1 = acc_tree_stats(_utts(rng, 3))
    s2 = acc_tree_stats(_utts(rng, 3))
    tot = sum_tree_stats([s1, s2])
    assert sum(s.count for s in tot.values()) == \
        sum(s.count for s in s1.values()) + \
        sum(s.count for s in s2.values())
    save_tree_stats(str(tmp_path / "s.npz"), tot)
    back = load_tree_stats(str(tmp_path / "s.npz"))
    assert set(back) == set(tot)
    for e in tot:
        assert back[e].count == tot[e].count
        np.testing.assert_allclose(back[e].sum, tot[e].sum)


def test_objf_merge_loses_likelihood():
    a = GaussStats(10, np.array([50.0]), np.array([251.0]))   # mean 5
    b = GaussStats(10, np.array([-50.0]), np.array([251.0]))  # mean -5
    assert a.objf() + b.objf() > a.add(b).objf() + 10


def test_cluster_phones_similar_merge_first():
    rng = np.random.default_rng(2)
    # phones 2 and 3 differ; make a 4th phone near phone 2
    utts = _utts(rng, 20)
    extra = []
    for f, p in utts[:10]:
        p2 = p.copy()
        p2[p2 == 2] = 4
        extra.append((f, p2))
    stats = acc_tree_stats(utts + extra)
    qs = cluster_phones(stats, [[1], [2], [3], [4]])
    # singletons present
    assert frozenset([1]) in qs and frozenset([3]) in qs
    # first merge is {2, 4} (identical distributions)
    merges = [q for q in qs if len(q) == 2]
    assert merges[0] == frozenset([2, 4])


def test_build_tree_splits_on_context():
    rng = np.random.default_rng(3)
    stats = acc_tree_stats(_utts(rng, 40))
    qs = cluster_phones(stats, [[1], [2], [3]])
    roots = [(True, True, [p]) for p in (1, 2, 3)]
    tree = build_tree(stats, qs, roots, max_leaves=4)
    assert tree.N == 3 and tree.P == 1
    assert tree.num_pdfs == 4
    # phone 1 splits on right context: different pdfs before 2 vs 3
    p12 = tree.pdf((0, 1, 2))
    p13 = tree.pdf((0, 1, 3))
    assert p12 is not None and p13 is not None and p12 != p13
    # phones 2 and 3 keep single leaves each, distinct from phone 1
    p2 = tree.pdf((1, 2, 0))
    p3 = tree.pdf((1, 3, 0))
    assert len({p12, p13, p2, p3}) == 4
    # unseen contexts still answered (SE splits always resolve)
    assert tree.pdf((3, 1, 1)) in (p12, p13)
    # Kaldi-binary round trip
    import io
    buf = io.BytesIO()
    write_tree(buf, tree)
    buf.seek(0)
    back = read_tree(buf)
    for w in ((0, 1, 2), (0, 1, 3), (1, 2, 0), (1, 3, 3), (2, 1, 3)):
        assert back.pdf(w) == tree.pdf(w)


def test_build_tree_cluster_thresh_merges():
    rng = np.random.default_rng(4)
    stats = acc_tree_stats(_utts(rng, 40))
    qs = cluster_phones(stats, [[1], [2], [3]])
    roots = [(True, True, [p]) for p in (1, 2, 3)]
    full = build_tree(stats, qs, roots, max_leaves=8)
    merged = build_tree(stats, qs, roots, max_leaves=8,
                        cluster_thresh=1e9)
    assert merged.num_pdfs < full.num_pdfs
    # not-split roots stay single leaves
    ns = build_tree(stats, qs, [(True, False, [1]), (True, True, [2]),
                                (True, True, [3])], max_leaves=8)
    assert ns.pdf((0, 1, 2)) == ns.pdf((0, 1, 3))


def test_tree_tool_cli_chain(tmp_path):
    rng = np.random.default_rng(5)
    utts = _utts(rng, 30)
    with kaldi_io.MatrixWriter(f"ark:{tmp_path}/feats.ark") as fw, \
            kaldi_io.IntVectorWriter(f"ark:{tmp_path}/ali.ark") as aw:
        for i, (f, p) in enumerate(utts):
            fw[f"u{i}"] = f
            aw[f"u{i}"] = p
    run = [sys.executable, "-m", "kaldi_ctc_tpu.cli.tree_tool"]
    subprocess.run(run + ["acc-stats", "--feats",
                          f"ark:{tmp_path}/feats.ark",
                          "--ali", f"ark:{tmp_path}/ali.ark",
                          "--output", f"{tmp_path}/stats.npz"],
                   check=True)
    subprocess.run(run + ["sum-stats", f"{tmp_path}/stats.npz",
                          "--output", f"{tmp_path}/sum.npz"], check=True)
    subprocess.run(run + ["questions", "--stats", f"{tmp_path}/sum.npz",
                          "--output", f"{tmp_path}/questions.int"],
                   check=True)
    subprocess.run(run + ["build", "--stats", f"{tmp_path}/sum.npz",
                          "--questions", f"{tmp_path}/questions.int",
                          "--max-leaves", "4",
                          "--output", f"{tmp_path}/tree"], check=True)
    out = subprocess.run(run + ["info", "--tree", f"{tmp_path}/tree"],
                         check=True, capture_output=True, text=True)
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info == {"N": 3, "P": 1, "num_pdfs": 4}

    # the built tree feeds prepare_egs --tree (context-dependent targets)
    from kaldi_ctc_tpu.cli import prepare_egs
    from kaldi_ctc_tpu.data.egs_io import SequentialEgsReader
    (tmp_path / "lexicon.txt").write_text("go a b\nhi a c\n")
    (tmp_path / "phones.txt").write_text("a 1\nb 2\nc 3\n")
    (tmp_path / "text").write_text("u0 go\nu1 hi\n")
    prepare_egs.main([
        "get", "--feats", f"ark:{tmp_path}/feats.ark",
        "--text", str(tmp_path / "text"),
        "--lexicon", str(tmp_path / "lexicon.txt"),
        "--phones", str(tmp_path / "phones.txt"),
        "--tree", f"{tmp_path}/tree",
        "--output", f"ark:{tmp_path}/egs.ark", "--compress", "0"])
    egs = {e.key: e for e in SequentialEgsReader(f"ark:{tmp_path}/egs.ark")}
    assert set(egs) == {"u0", "u1"}
    # 'go' = a b: phone a before b vs 'hi' = a c: a before c -> the
    # context-split pdfs differ in the label sequences
    assert egs["u0"].labels[0] != egs["u1"].labels[0]


def test_acc_stats_instance_starts_and_empty_utt():
    rng = np.random.default_rng(6)
    f = rng.standard_normal((4, 2)).astype(np.float32)
    phones = np.array([1, 1, 1, 1], np.int32)
    # starts mark a re-entry at frame 2: two instances of phone 1
    starts = np.array([True, False, True, False])
    stats = acc_tree_stats([(f, phones, starts),
                            (np.zeros((0, 2), np.float32),
                             np.zeros(0, np.int32))])
    evs = set(stats)
    # first instance sees phone 1 on its right, second on its left
    assert ((-1, 0), (0, 0), (1, 1), (2, 1)) in evs
    assert ((-1, 0), (0, 1), (1, 1), (2, 0)) in evs
    # without starts the whole run is one instance with zero context
    stats2 = acc_tree_stats([(f, phones)])
    assert set(stats2) == {((-1, 0), (0, 0), (1, 1), (2, 0))}


def test_built_tree_drives_make_tlg(tmp_path):
    """The natively-built tree plugs into graph_tool make-tlg --tree:
    the context-dependent TLG builds and its non-blank ilabels are
    exactly the tree's pdfs + 1 (CTC shift)."""
    from kaldi_ctc_tpu.cli import graph_tool
    from kaldi_ctc_tpu.decoding.wfst import NativeFst
    from kaldi_ctc_tpu.utils.tree import write_tree

    rng = np.random.default_rng(7)
    stats = acc_tree_stats(_utts(rng, 40))
    qs = cluster_phones(stats, [[1], [2], [3]])
    tree = build_tree(stats, qs, [(True, True, [p]) for p in (1, 2, 3)],
                      max_leaves=4)
    write_tree(f"{tmp_path}/tree", tree)
    (tmp_path / "lexicon.txt").write_text("go a b\nhi a c\nb b\n")
    (tmp_path / "phones.txt").write_text("a 1\nb 2\nc 3\n")
    (tmp_path / "lm.arpa").write_text(
        "\\data\\\nngram 1=5\n\n\\1-grams:\n-0.9 <s>\n-0.7 </s>\n"
        "-0.5 go\n-0.6 hi\n-0.8 b\n\n\\end\\\n")
    tlg = f"{tmp_path}/TLG.fst"
    graph_tool.main(["make-tlg", "--lexicon", f"{tmp_path}/lexicon.txt",
                     "--arpa", f"{tmp_path}/lm.arpa",
                     "--phones", f"{tmp_path}/phones.txt",
                     "--tree", f"{tmp_path}/tree", "--output", tlg])
    fst = NativeFst.load(tlg)
    _start, arcs, _w, _f = fst.to_arrays()
    ilabels = set(int(x) for x in arcs[:, 1]) - {0, 1}   # eps, blank
    # CTC graph labels are pdf+2 (pdf+1 column, +1 shift)
    assert ilabels
    assert max(ilabels) <= tree.num_pdfs + 1

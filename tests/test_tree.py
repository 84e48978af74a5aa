"""ContextDependency tree + context expansion tests (src/tree slice):
round-trip I/O, mono/triphone lookups, and a full flat-start triphone
pipeline (labels -> train -> triphone TLG -> word decode)."""

import io
import json
import math
import os

import numpy as np

from kaldi_ctc_tpu.decoding.context import context_expand, labels_to_pdfs
from kaldi_ctc_tpu.decoding.wfst import NativeFst
from kaldi_ctc_tpu.utils.tree import (
    CE, SE, TE, ContextDependency, mono_tree, read_tree, write_tree)

INF = np.float32(np.inf)


def triphone_tree(num_phones=5):
    """Handmade triphone tree: pdf = (center-1)*2 + [right phone == 2].
    (A 'question' on the right context, the build-tree idiom.)"""
    children = [None]
    for p in range(1, num_phones + 1):
        children.append(
            SE(2, [2], CE((p - 1) * 2 + 1), CE((p - 1) * 2)))
    return ContextDependency(N=3, P=1, root=TE(1, children))


class TestTree:
    def test_mono_tree(self):
        t = mono_tree(4)
        assert t.N == 1 and t.P == 0
        for p in range(1, 5):
            assert t.pdf([p]) == p - 1
        assert t.pdf([0]) is None
        assert t.num_pdfs == 4

    def test_mono_tree_pdf_classes(self):
        t = mono_tree(3, pdf_classes_per_phone=2)
        assert t.pdf([2], pdf_class=0) == 2
        assert t.pdf([2], pdf_class=1) == 3
        assert t.num_pdfs == 6

    def test_triphone_lookup(self):
        t = triphone_tree()
        assert t.pdf([0, 1, 0]) == 0
        assert t.pdf([3, 1, 2]) == 1   # right == 2 -> odd pdf
        assert t.pdf([1, 4, 2]) == 7
        assert t.pdf([2, 5, 3]) == 8
        assert t.num_pdfs == 10

    def test_round_trip(self):
        for t in (mono_tree(6), triphone_tree(4),
                  ContextDependency(3, 1, SE(0, [1, 3], CE(7), TE(1, [
                      None, CE(0), SE(-1, [0], CE(1), CE(2))])))):
            buf = io.BytesIO()
            write_tree(buf, t)
            buf.seek(0)
            back = read_tree(buf)
            assert back.N == t.N and back.P == t.P
            assert back.root == t.root

    def test_labels_to_pdfs(self):
        t = triphone_tree()
        phones = np.asarray([1, 2, 1], np.int32)
        # windows: (0,1,2) (1,2,1) (2,1,0) -> pdfs 1, 2, 0 -> +1 shift
        np.testing.assert_array_equal(labels_to_pdfs(phones, t), [2, 3, 1])


class TestContextExpand:
    def test_mono_expand_is_relabel(self):
        t = mono_tree(3)
        arcs = np.asarray([[0, 1, 7, 1], [1, 3, 8, 2]], np.int32)
        f = NativeFst.from_arrays(
            0, 3, arcs, np.asarray([0.5, 0.25], np.float32),
            np.asarray([INF, INF, 0.0], np.float32))
        g = context_expand(f, t)
        _, garcs, gw, gfin = g.to_arrays()
        # phone p -> pdf+1 == p for mono
        assert sorted(garcs[:, 1].tolist()) == [1, 3]
        assert sorted(garcs[:, 2].tolist()) == [7, 8]

    def test_triphone_expand_paths(self):
        # chain 1 -> 2 -> 1; expansion emits pdfs of windows
        # (0,1,2), (1,2,1), (2,1,0) one phone late
        t = triphone_tree()
        arcs = np.asarray([[0, 1, 9, 1], [1, 2, 0, 2], [2, 1, 0, 3]],
                          np.int32)
        f = NativeFst.from_arrays(
            0, 4, arcs, np.zeros(3, np.float32),
            np.asarray([INF, INF, INF, 0.0], np.float32))
        g = context_expand(f, t)
        _, garcs, gw, gfin = g.to_arrays()
        ilabels = [il for il in garcs[:, 1].tolist() if il != 0]
        # expected pdf+1 sequence: [2, 3, 1] (see test_labels_to_pdfs)
        assert sorted(ilabels) == sorted([2, 3, 1])
        # words preserved
        assert 9 in garcs[:, 2].tolist()
        # single final path; graph is connected and decodable
        assert g.num_states > 0

    def test_expand_scores_against_labels(self):
        """Decoding scores painted to the labels_to_pdfs sequence must
        recover the word through the expanded graph."""
        from kaldi_ctc_tpu.decoding.wfst import decode_best_path
        t = triphone_tree()
        phones = [1, 2, 1]
        arcs = []
        for i, p in enumerate(phones):
            arcs.append([i, p, 9 if i == 0 else 0, i + 1])
        f = NativeFst.from_arrays(
            0, len(phones) + 1, np.asarray(arcs, np.int32),
            np.zeros(len(phones), np.float32),
            np.asarray([INF] * len(phones) + [0.0], np.float32))
        tlg = context_expand(f, t).add_self_loops().make_ctc_graph()
        labels = labels_to_pdfs(np.asarray(phones), t)  # pdf+1
        ncols = 11  # 10 pdfs + blank
        frames = []
        for lab in labels:
            frames += [int(lab)] * 3 + [0]
        scores = np.full((len(frames), ncols), -5.0, np.float32)
        for ti, lab in enumerate(frames):
            scores[ti, lab] = 5.0
        words, align, cost, final = decode_best_path(tlg, scores)
        assert list(words) == [9]
        assert final


ARPA = """\\data\\
ngram 1=5

\\1-grams:
-0.5 <s>
-0.5 </s>
-0.5 ab
-0.5 c
-0.8 de

\\end\\
"""


def test_flat_start_triphone_pipeline(tmp_path):
    """Flat-start with context-dependent targets: transcripts + lexicon +
    triphone tree -> egs -> train -> triphone TLG -> word decode."""
    from kaldi_ctc_tpu.cli import decode_ctc, graph_tool, prepare_egs, train_ctc
    from kaldi_ctc_tpu.utils import kaldi_io

    lexicon = {"ab": ["p1", "p2"], "c": ["p3"], "de": ["p4", "p5"]}
    phone_ids = {"p1": 1, "p2": 2, "p3": 3, "p4": 4, "p5": 5}
    tree = triphone_tree(5)
    tree_path = tmp_path / "tree"
    write_tree(str(tree_path), tree)
    lex_path = tmp_path / "lexicon.txt"
    lex_path.write_text("\n".join(
        f"{w} {' '.join(ps)}" for w, ps in lexicon.items()) + "\n")
    phones_path = tmp_path / "phones.txt"
    phones_path.write_text("\n".join(
        f"{p} {i}" for p, i in phone_ids.items()) + "\n")
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text(ARPA)

    rng = np.random.default_rng(3)
    words_list = list(lexicon)
    fark = tmp_path / "feats.ark"
    lines = []
    D = 12
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw:
        for i in range(16):
            ws = []
            for _ in range(int(rng.integers(1, 4))):
                w = words_list[int(rng.integers(3))]
                while ws and w == ws[-1]:
                    w = words_list[int(rng.integers(3))]
                ws.append(w)
            phones = [phone_ids[p] for w in ws for p in lexicon[w]]
            labels = labels_to_pdfs(np.asarray(phones), tree)
            span = 8
            t = len(labels) * span
            feats = rng.standard_normal((t, D)).astype(np.float32) * 0.1
            for j, lab in enumerate(labels):
                feats[j * span:(j + 1) * span, int(lab) % D] += 2.0
            fw[f"utt{i}"] = feats
            lines.append(f"utt{i} {' '.join(ws)}")
    text_path = tmp_path / "text"
    text_path.write_text("\n".join(lines) + "\n")

    egs = tmp_path / "egs.ark"
    prepare_egs.main([
        "get", "--feats", f"ark:{fark}", "--text", str(text_path),
        "--lexicon", str(lex_path), "--phones", str(phones_path),
        "--tree", str(tree_path), "--output", f"ark:{egs}"])

    exp = str(tmp_path / "exp_tri")
    train_ctc.main([
        "--egs", f"ark:{egs}", "--num-targets", "11",
        "--hidden-dim", "24", "--num-layers", "2",
        "--epochs", "300", "--minibatch-size", "16",
        "--initial-learning-rate", "3e-2", "--final-learning-rate", "3e-3",
        "--momentum", "0.9", "--dir", exp, "--checkpoint-period", "100"])

    tlg = str(tmp_path / "TLG.fst")
    graph_tool.main([
        "make-tlg", "--lexicon", str(lex_path), "--arpa", str(arpa_path),
        "--phones", str(phones_path), "--tree", str(tree_path),
        "--output", tlg])

    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_ctc.main([
            "--feats", f"ark:{fark}", "--dir", exp,
            "--method", "wfst", "--graph", tlg,
            "--words", tlg + ".words.txt",
            "--use-priors", "0", "--blank-threshold", "0.98",
            "--text", str(text_path), "--minibatch-size", "8"])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result["label_error_rate"] < 0.1, result

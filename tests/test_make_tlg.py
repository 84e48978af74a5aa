"""Native graph building: composition, lexicon L, and the full
lexicon+LM → TLG → word decoding pipeline with zero Kaldi fixtures."""

import io
import json
import os

import numpy as np
import pytest

from kaldi_ctc_tpu.decoding.wfst import NativeFst, decode_best_path
from kaldi_ctc_tpu.lm import arpa_to_fst_arrays, parse_arpa
from kaldi_ctc_tpu.lm.lexicon import lexicon_to_fst_arrays, parse_lexicon

INF = np.float32(np.inf)


def test_compose_basic():
    # A: accepts input 1 -> output 7, then 2 -> 8
    a = NativeFst.from_arrays(
        0, 3, np.asarray([[0, 1, 7, 1], [1, 2, 8, 2]], np.int32),
        np.asarray([0.5, 0.25], np.float32),
        np.asarray([INF, INF, 0.0], np.float32))
    # B: maps 7 -> 70, 8 -> 80
    b = NativeFst.from_arrays(
        0, 1, np.asarray([[0, 7, 70, 0], [0, 8, 80, 0]], np.int32),
        np.asarray([1.0, 2.0], np.float32),
        np.asarray([0.0], np.float32))
    c = a.compose(b)
    assert c.num_states == 3
    assert c.num_arcs == 2
    # decode through c: inputs 1, 2 -> outputs 70, 80 with summed weights
    ilabel_map = np.asarray([-1, 0, 1], np.int32)
    scores = np.zeros((2, 2), np.float32)
    scores[0, 0] = 1.0
    scores[1, 1] = 1.0
    words, align, cost, final = decode_best_path(c, scores,
                                                 ilabel_map=ilabel_map)
    assert list(words) == [70, 80]
    assert final
    assert abs(cost - (0.5 + 0.25 + 1.0 + 2.0 - 2.0)) < 1e-5


def test_lexicon_fst():
    lex = parse_lexicon(io.StringIO("ab p1 p2\nc p3\n"))
    start, n, arcs, w, fin, p2i, w2i = lexicon_to_fst_arrays(lex)
    L = NativeFst.from_arrays(start, n, arcs, w, fin)
    # decode phone sequence p1 p2 p3 -> words ab c; phone id i scores
    # against column i (identity map, no CTC shift on raw L)
    pid = [p2i["p1"], p2i["p2"], p2i["p3"]]
    ncols = max(p2i.values()) + 1
    ilabel_map = np.asarray([-1] + list(range(1, ncols)), np.int32)
    scores = np.full((3, ncols), -5.0, np.float32)
    for t, p in enumerate(pid):
        scores[t, p] = 5.0
    words, align, cost, final = decode_best_path(
        L, scores, ilabel_map=ilabel_map)
    # map back
    id2w = {v: k for k, v in w2i.items()}
    assert [id2w[int(x)] for x in words] == ["ab", "c"]


ARPA = """\\
\\data\\
ngram 1=5

\\1-grams:
-0.5 <s>
-0.5 </s>
-0.5 ab
-0.5 c
-0.8 de

\\end\\
"""


def test_full_native_tlg_word_decoding(tmp_path):
    """Train a toy phone model, build TLG natively, decode words."""
    import jax

    from kaldi_ctc_tpu.cli import decode_ctc, graph_tool, train_ctc
    from kaldi_ctc_tpu.utils import kaldi_io

    lexicon = {"ab": ["p1", "p2"], "c": ["p3"], "de": ["p4", "p5"]}
    lex_path = tmp_path / "lexicon.txt"
    lex_path.write_text(
        "\n".join(f"{w} {' '.join(ps)}" for w, ps in lexicon.items()) + "\n")
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text(ARPA.replace("\\\\", "\\"))

    # dataset: word sequences -> phone labels (ids 1..5) -> painted feats
    phone_ids = {"p1": 1, "p2": 2, "p3": 3, "p4": 4, "p5": 5}
    rng = np.random.default_rng(0)
    words_list = list(lexicon)
    fark, aark = tmp_path / "feats.ark", tmp_path / "ali.ark"
    refs = {}
    D = 8
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw, \
         kaldi_io.IntVectorWriter(f"ark:{aark}") as aw:
        for i in range(16):
            # avoid consecutive repeats: equal adjacent phones across a
            # word boundary merge in the alignment (no blank between),
            # which CTC cannot represent as two words
            ws = []
            for _ in range(int(rng.integers(1, 4))):
                w = words_list[int(rng.integers(3))]
                while ws and w == ws[-1]:
                    w = words_list[int(rng.integers(3))]
                ws.append(w)
            phones = [phone_ids[p] for w in ws for p in lexicon[w]]
            span = 8
            t = len(phones) * span
            feats = rng.standard_normal((t, D)).astype(np.float32) * 0.1
            ali = np.zeros(t, np.int32)
            for j, ph in enumerate(phones):
                feats[j * span:(j + 1) * span, ph % D] += 2.0
                ali[j * span:(j + 1) * span] = ph - 1  # pdf = phone-1
            fw[f"utt{i}"] = feats
            aw[f"utt{i}"] = ali
            refs[f"utt{i}"] = ws
    text = tmp_path / "words_ref.txt"
    text.write_text("\n".join(
        f"{k} {' '.join(v)}" for k, v in refs.items()) + "\n")

    exp = str(tmp_path / "exp")
    train_ctc.main([
        "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--num-targets", "6", "--hidden-dim", "24", "--num-layers", "2",
        "--epochs", "300", "--minibatch-size", "16",
        "--initial-learning-rate", "3e-2", "--final-learning-rate", "3e-3",
        "--momentum", "0.9", "--dir", exp, "--checkpoint-period", "100",
    ])

    # phones.txt pinned to the training label ids
    phones_path = tmp_path / "phones.txt"
    phones_path.write_text("\n".join(
        f"{p} {i}" for p, i in phone_ids.items()) + "\n")
    tlg = str(tmp_path / "TLG.fst")
    graph_tool.main([
        "make-tlg", "--lexicon", str(lex_path), "--arpa", str(arpa_path),
        "--phones", str(phones_path), "--output", tlg,
    ])
    assert os.path.exists(tlg)
    assert os.path.exists(tlg + ".words.txt")

    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_ctc.main([
            "--feats", f"ark:{fark}", "--dir", exp,
            "--method", "wfst", "--graph", tlg,
            "--words", tlg + ".words.txt",
            "--use-priors", "0", "--blank-threshold", "0.98",
            "--text", str(text), "--minibatch-size", "8",
        ])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result["label_error_rate"] < 0.1, result


def test_homophone_lexicon_determinizes(tmp_path):
    """Homophones/prefix prons make plain LG non-determinizable; the
    disambig-symbol route (add_lex_disambig + determinize-star + strip)
    must build a working graph that picks the higher-LM-probability
    homophone."""
    from kaldi_ctc_tpu.cli import graph_tool

    lex_path = tmp_path / "lexicon.txt"
    # 'red' and 'read' are homophones; 're' is a prefix pron
    lex_path.write_text(
        "red p1 p2\nread p1 p2\nre p1\nblue p3 p4\n")
    arpa = """\\data\\
ngram 1=6

\\1-grams:
-0.4 <s>
-0.4 </s>
-0.3 red
-1.5 read
-0.9 re
-0.5 blue

\\end\\
"""
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text(arpa)
    tlg = str(tmp_path / "TLG.fst")
    graph_tool.main([
        "make-tlg", "--lexicon", str(lex_path), "--arpa", str(arpa_path),
        "--output", tlg])
    fst = NativeFst.load(tlg)
    assert fst.num_states > 0

    # phones p1..p4 got ids 1..4; decode "p1 p2 p3 p4" (CTC columns:
    # blank=0, phone i -> column i)
    with open(tlg + ".words.txt") as f:
        w2i = {line.split()[0]: int(line.split()[1]) for line in f}
    ncols = 5
    frames = []
    for ph in (1, 2, 0, 3, 4):   # blank between words
        frames += [ph] * 4
    scores = np.full((len(frames), ncols), -5.0, np.float32)
    for t, ph in enumerate(frames):
        scores[t, ph] = 5.0
    words, align, cost, final = decode_best_path(fst, scores)
    id2w = {v: k for k, v in w2i.items()}
    hyp = [id2w[int(x)] for x in words]
    # homophone resolved toward the higher LM prob ('red' at -0.3)
    assert hyp == ["red", "blue"], hyp


def test_flat_start_training(tmp_path):
    """Full flat-start pipeline: transcripts + lexicon -> egs (no GMM
    alignments) -> train -> native TLG -> word decoding."""
    from kaldi_ctc_tpu.cli import decode_ctc, graph_tool, prepare_egs, train_ctc
    from kaldi_ctc_tpu.utils import kaldi_io

    lexicon = {"ab": ["p1", "p2"], "c": ["p3"], "de": ["p4", "p5"]}
    lex_path = tmp_path / "lexicon.txt"
    lex_path.write_text(
        "\n".join(f"{w} {' '.join(ps)}" for w, ps in lexicon.items()) + "\n")
    phones_path = tmp_path / "phones.txt"
    phone_ids = {"p1": 1, "p2": 2, "p3": 3, "p4": 4, "p5": 5}
    phones_path.write_text(
        "\n".join(f"{p} {i}" for p, i in phone_ids.items()) + "\n")
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text(ARPA.replace("\\\\", "\\"))

    rng = np.random.default_rng(1)
    words_list = list(lexicon)
    fark = tmp_path / "feats.ark"
    text_path = tmp_path / "text"
    lines = []
    D = 8
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw:
        for i in range(16):
            ws = []
            for _ in range(int(rng.integers(1, 4))):
                w = words_list[int(rng.integers(3))]
                while ws and w == ws[-1]:
                    w = words_list[int(rng.integers(3))]
                ws.append(w)
            phones = [phone_ids[p] for w in ws for p in lexicon[w]]
            span = 8
            t = len(phones) * span
            feats = rng.standard_normal((t, D)).astype(np.float32) * 0.1
            for j, ph in enumerate(phones):
                feats[j * span:(j + 1) * span, ph % D] += 2.0
            fw[f"utt{i}"] = feats
            lines.append(f"utt{i} {' '.join(ws)}")
    text_path.write_text("\n".join(lines) + "\n")
    # one utterance with an OOV word: must be skipped, not crash
    with open(text_path, "a") as f:
        f.write("uttOOV zzz\n")

    egs = tmp_path / "egs.ark"
    prepare_egs.main([
        "get", "--feats", f"ark:{fark}",
        "--text", str(text_path), "--lexicon", str(lex_path),
        "--phones", str(phones_path),
        "--output", f"ark:{egs}"])

    exp = str(tmp_path / "exp_fs")
    train_ctc.main([
        "--egs", f"ark:{egs}", "--num-targets", "6",
        "--hidden-dim", "24", "--num-layers", "2",
        "--epochs", "300", "--minibatch-size", "16",
        "--initial-learning-rate", "3e-2", "--final-learning-rate", "3e-3",
        "--momentum", "0.9", "--dir", exp, "--checkpoint-period", "100",
    ])

    tlg = str(tmp_path / "TLG.fst")
    graph_tool.main([
        "make-tlg", "--lexicon", str(lex_path), "--arpa", str(arpa_path),
        "--phones", str(phones_path), "--output", tlg])

    import contextlib, io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_ctc.main([
            "--feats", f"ark:{fark}", "--dir", exp,
            "--method", "wfst", "--graph", tlg,
            "--words", tlg + ".words.txt",
            "--use-priors", "0", "--blank-threshold", "0.98",
            "--text", str(text_path), "--minibatch-size", "8",
        ])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    # the OOV utterance has no hypothesis constraint; it counts 1 ref word
    assert result["label_error_rate"] < 0.15, result


def test_graph_info_check_stochastic(tmp_path, capsys):
    """fstisstochastic analogue: a stochastic 2-arc FST reports ~0
    residuals; scaling one weight breaks it."""
    import numpy as np

    from kaldi_ctc_tpu.cli import graph_tool
    from kaldi_ctc_tpu.decoding.wfst import NativeFst

    half = float(np.log(2.0))  # -log(0.5)
    arcs = np.asarray([[0, 1, 1, 1], [0, 2, 2, 1]], np.int32)
    finals = np.asarray([np.inf, 0.0], np.float32)

    good = str(tmp_path / "good.fst")
    NativeFst.from_arrays(0, 2, arcs,
                          np.asarray([half, half], np.float32),
                          finals).write(good)
    graph_tool.main(["info", "--graph", good, "--check-stochastic", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["is_stochastic"] is True
    assert abs(out["stochastic_min"]) < 1e-6
    assert abs(out["stochastic_max"]) < 1e-6

    bad = str(tmp_path / "bad.fst")
    NativeFst.from_arrays(0, 2, arcs,
                          np.asarray([half, 3.0], np.float32),
                          finals).write(bad)
    graph_tool.main(["info", "--graph", bad, "--check-stochastic", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["is_stochastic"] is False

    # dead-end state (non-final, no arcs): zero outgoing mass must fail
    # the check like fstisstochastic's infinite residual, not be skipped
    dead = str(tmp_path / "dead.fst")
    NativeFst.from_arrays(
        0, 3, np.asarray([[0, 1, 1, 1], [0, 2, 2, 2]], np.int32),
        np.asarray([half, half], np.float32),
        np.asarray([np.inf, 0.0, np.inf], np.float32)).write(dead)
    graph_tool.main(["info", "--graph", dead, "--check-stochastic", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["is_stochastic"] is False
    assert out["stochastic_max"] == float("inf")


def test_build_tlg_phone_id_contract():
    """Regression guard for the WER-100 id-drift class (commit 659cfef):
    build_tlg must emit graph ilabels at the CALLER-supplied phone ids,
    not lexicon order-of-appearance ids.  Posterior columns are written
    at the supplied ids (the bench/recipe contract: column p scores
    phone p, graph ilabel p+1 after the CTC shift); decoding must
    recover every word exactly.  Before the fix, build_tlg renumbered
    phones by appearance so every column fed the wrong ilabel and the
    beam floundered (WER 100)."""
    from kaldi_ctc_tpu.data.synth_lang import synth_posteriors
    from kaldi_ctc_tpu.decoding.graph import build_tlg

    # ids deliberately NOT in order of lexicon appearance: first-seen
    # phone p9 gets id 9, etc. — appearance-order numbering would
    # assign p9 -> 1 and scramble every ilabel
    num_phones = 9
    lexicon = [("alpha", ["p9", "p2"]), ("beta", ["p5"]),
               ("gamma", ["p1", "p7", "p3"]), ("delta", ["p4", "p8"])]
    phone_to_id = {f"p{i}": i for i in range(1, num_phones + 1)}
    arpa = ("\\data\\\nngram 1=6\n\n\\1-grams:\n"
            "-99 <s>\n-0.9 </s>\n-0.6 alpha\n-0.6 beta\n"
            "-0.6 gamma\n-0.6 delta\n\n\\end\\\n")
    lm = parse_arpa(io.StringIO(arpa))
    tlg, word_to_id, p2i_out = build_tlg(
        lexicon, lm, phone_to_id=dict(phone_to_id))
    # the returned map must preserve every supplied id verbatim
    for p, i in phone_to_id.items():
        assert p2i_out[p] == i, (p, i, p2i_out[p])

    pron = dict(lexicon)
    id_to_word = {i: w for w, i in word_to_id.items()}
    rng = np.random.default_rng(3)
    errs = n_ref = 0
    for _ in range(8):
        ws = [lexicon[int(rng.integers(4))][0] for _ in range(5)]
        phone_seq = [phone_to_id[p] for w in ws for p in pron[w]]
        post = synth_posteriors(phone_seq, num_phones, rng)
        scores = np.log(post).astype(np.float32)
        words, _, _, ok = decode_best_path(tlg, scores)
        assert ok
        hyp = [id_to_word[int(w)] for w in words]
        n_ref += len(ws)
        errs += sum(a != b for a, b in zip(hyp, ws)) + abs(
            len(hyp) - len(ws))
    # id drift makes ~every word wrong; the synthetic posteriors'
    # competitor mass allows the odd genuine beam error, so the guard
    # is a 10% ceiling, far below the ~100% failure mode it pins
    assert errs / n_ref < 0.10, (
        f"{errs}/{n_ref} word errors — ilabel/id drift")

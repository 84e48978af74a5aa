"""Const-ARPA flat-trie LM: exact scoring parity with the dict-backed
ArpaLm, save/load round-trip, CLI compile + perplexity + lmrescore."""

import io
import itertools
import json
import math
import subprocess
import sys

import numpy as np

from kaldi_ctc_tpu.lm import parse_arpa, sentence_logprob
from kaldi_ctc_tpu.lm.const_arpa import ConstArpaLm, compile_const_arpa
from tests.test_lm import ARPA

ARPA3 = """\
\\data\\
ngram 1=6
ngram 2=6
ngram 3=4

\\1-grams:
-0.9 <s> -0.35
-0.8 </s>
-0.5 a -0.3
-0.6 b -0.25
-0.9 c -0.1
-1.2 <unk>

\\2-grams:
-0.2 <s> a -0.1
-0.3 a b -0.15
-0.4 b c -0.2
-0.5 c </s>
-0.7 a a -0.05
-0.6 b a

\\3-grams:
-0.1 <s> a b
-0.2 a b c
-0.3 b c </s>
-0.25 a a b

\\end\\
"""


def _both(text):
    lm = parse_arpa(io.StringIO(text))
    return lm, compile_const_arpa(lm)


def test_logprob_parity_exhaustive():
    for text in (ARPA, ARPA3):
        lm, const = _both(text)
        words = ["<s>", "</s>", "a", "b", "c", "<unk>", "zzz"]
        for w in words:
            for h in itertools.chain(
                    [()],
                    itertools.product(words, repeat=1),
                    itertools.product(words, repeat=2)):
                want = lm.logprob(w, tuple(h))
                got = const.logprob(w, tuple(h))
                assert abs(want - got) < 1e-5, (w, h, want, got)


def test_has_ngram_parity():
    lm, const = _both(ARPA3)
    words = ["<s>", "</s>", "a", "b", "c", "zzz"]
    for n in (1, 2, 3):
        for ng in itertools.product(words, repeat=n):
            assert const.has_ngram(ng) == lm.has_ngram(ng), ng


def test_save_load_roundtrip(tmp_path):
    lm, const = _both(ARPA3)
    p = str(tmp_path / "lm.npz")
    const.save(p)
    back = ConstArpaLm.load(p)
    assert back.order == const.order
    assert back.vocab == const.vocab
    for w in ("a", "b", "c", "</s>"):
        for h in ((), ("a",), ("a", "b"), ("<s>",)):
            assert abs(back.logprob(w, h) - lm.logprob(w, h)) < 1e-5


def test_sentence_logprob_duck_typing():
    lm, const = _both(ARPA3)
    for sent in (["a", "b", "c"], ["a", "a", "b", "c"], ["zzz", "a"]):
        assert abs(sentence_logprob(lm, sent)
                   - sentence_logprob(const, sent)) < 1e-5


def test_cli_compile_and_perplexity(tmp_path):
    (tmp_path / "lm.arpa").write_text(ARPA3)
    (tmp_path / "text").write_text("u1 a b c\nu2 a a b\n")
    run = [sys.executable, "-m", "kaldi_ctc_tpu.cli.lm_tool"]
    subprocess.run(run + ["compile-const", "--arpa",
                          f"{tmp_path}/lm.arpa",
                          "--output", f"{tmp_path}/lm.npz"], check=True)

    def ppl(extra):
        out = subprocess.run(run + ["perplexity", "--text",
                                    f"{tmp_path}/text"] + extra,
                             check=True, capture_output=True, text=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    a = ppl(["--arpa", f"{tmp_path}/lm.arpa"])
    c = ppl(["--const-arpa", f"{tmp_path}/lm.npz"])
    assert abs(a["perplexity"] - c["perplexity"]) < 1e-6
    assert a["num_words"] == c["num_words"]


def test_lmrescore_const_matches_plain(tmp_path):
    from kaldi_ctc_tpu.decoding.det_lattice import (
        CompactLattice, write_compact_lattice_text)
    clat = CompactLattice(
        start=0, num_states=3,
        arc_from=[0, 0, 1], arc_to=[1, 2, 2], arc_word=[1, 2, 2],
        arc_graph_cost=[0.5, 1.0, 0.25],
        arc_acoustic_cost=[1.0, 2.0, 0.5],
        arc_ilabels=[(3,), (4,), (4, 4)],
        final_graph_cost=[math.inf, math.inf, 0.0],
        final_acoustic_cost=[0.0, 0.0, 0.0],
        final_ilabels=[(), (), ()])
    with open(tmp_path / "in.lats", "w") as f:
        write_compact_lattice_text(f, "utt1", clat)
    (tmp_path / "lm.arpa").write_text(ARPA3)
    (tmp_path / "words.txt").write_text("<eps> 0\na 1\nb 2\nc 3\n")
    run = [sys.executable, "-m", "kaldi_ctc_tpu.cli"]
    subprocess.run(
        [sys.executable, "-m", "kaldi_ctc_tpu.cli.lm_tool",
         "compile-const", "--arpa", f"{tmp_path}/lm.arpa",
         "--output", f"{tmp_path}/lm.npz"], check=True)
    base = [sys.executable, "-m", "kaldi_ctc_tpu.cli.lattice_tool",
            "lmrescore", "--lattices", f"{tmp_path}/in.lats",
            "--words", f"{tmp_path}/words.txt", "--lm-scale", "0.7"]
    subprocess.run(base + ["--arpa", f"{tmp_path}/lm.arpa",
                           "--output", f"{tmp_path}/a.lats"], check=True)
    subprocess.run(base + ["--const-arpa", f"{tmp_path}/lm.npz",
                           "--output", f"{tmp_path}/c.lats"], check=True)
    assert (tmp_path / "a.lats").read_text() == \
        (tmp_path / "c.lats").read_text()
    assert (tmp_path / "a.lats").read_text() != ""


ARPA_NOUNK = """\
\\data\\
ngram 1=4
ngram 2=2
ngram 3=1

\\1-grams:
-0.9 <s> -0.4
-0.7 </s>
-0.5 a -0.3
-0.6 b -0.2

\\2-grams:
-0.3 a b -0.15
-0.4 b </s>

\\3-grams:
-0.2 b a b

\\end\\
"""


def test_no_unk_floor_includes_backoff():
    # OOV with history: the accumulated backoff must ride on the -99
    # floor exactly like ArpaLm
    lm, const = _both(ARPA_NOUNK)
    for h in ((), ("a",), ("a", "b"), ("zzz",)):
        want = lm.logprob("zzz", h)
        got = const.logprob("zzz", h)
        assert abs(want - got) < 1e-5, (h, want, got)


def test_structural_nodes_are_not_ngrams():
    # the 3-gram 'b a b' has no explicit 'b a' bigram: the compiler adds
    # a structural node to descend through, but has_ngram must not
    # report it (ArpaLm parity), while the 3-gram still scores
    lm, const = _both(ARPA_NOUNK)
    assert not lm.has_ngram(("b", "a"))
    assert not const.has_ngram(("b", "a"))
    assert const.has_ngram(("b", "a", "b"))
    assert abs(const.logprob("b", ("b", "a")) -
               lm.logprob("b", ("b", "a"))) < 1e-5


def test_save_path_without_npz_suffix(tmp_path):
    _lm, const = _both(ARPA3)
    p = str(tmp_path / "lm.bin")       # no .npz suffix
    const.save(p)
    back = ConstArpaLm.load(p)
    assert abs(back.logprob("b", ("a",)) -
               const.logprob("b", ("a",))) < 1e-6

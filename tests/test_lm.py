"""ARPA parser, backoff scoring, and G.fst compilation tests.

Golden invariant: the cost of a forced word path through the compiled
acceptor (epsilon backoffs allowed) equals -ln(10) * the backoff-scored
sentence log-probability — the property arpa2fst guarantees.
"""

import io
import math

import numpy as np
import pytest

from kaldi_ctc_tpu.lm import (
    arpa_to_fst_arrays,
    parse_arpa,
    sentence_logprob,
)

LN10 = math.log(10.0)

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.9 <s> -0.4
-0.7 </s>
-0.5 a -0.3
-0.6 b -0.2
-1.0 <unk>

\\2-grams:
-0.2 <s> a
-0.3 a b
-0.4 b </s>
-0.7 a a

\\end\\
"""


def _lm():
    return parse_arpa(io.StringIO(ARPA))


def test_parse():
    lm = _lm()
    assert lm.order == 2
    assert lm.counts == [5, 4]
    assert lm.ngrams[("a", "b")] == (-0.3, 0.0)
    assert lm.ngrams[("a",)] == (-0.5, -0.3)


def test_logprob_direct_and_backoff():
    lm = _lm()
    # explicit bigram
    assert lm.logprob("a", ("<s>",)) == pytest.approx(-0.2)
    # backoff: P(a | b) = bo(b) + P(a) = -0.2 + -0.5
    assert lm.logprob("a", ("b",)) == pytest.approx(-0.7)
    # OOV -> <unk>
    assert lm.logprob("zzz", ("a",)) == pytest.approx(-1.0 + -0.3)


def test_sentence_logprob():
    lm = _lm()
    # P(a|<s>) P(b|a) P(</s>|b) = -0.2 -0.3 -0.4
    assert sentence_logprob(lm, ["a", "b"]) == pytest.approx(-0.9)
    # backoff path: P(a|<s>) P(a|a) P(</s>|a) = -0.2 -0.7 + (bo(a)+P(</s>))
    assert sentence_logprob(lm, ["a", "a"]) == pytest.approx(
        -0.2 + -0.7 + (-0.3 + -0.7))


def _path_cost(start, n_states, arcs, weights, finals, word_ids):
    """Min cost of accepting the word sequence (eps-closure DP)."""
    INF = float("inf")

    def eps_closure(dist):
        changed = True
        while changed:
            changed = False
            for (s, il, ol, t), w in zip(arcs, weights):
                if il == 0 and dist[s] + w < dist[t] - 1e-12:
                    dist[t] = dist[s] + w
                    changed = True
        return dist

    dist = [INF] * n_states
    dist[start] = 0.0
    dist = eps_closure(dist)
    for wid in word_ids:
        nxt = [INF] * n_states
        for (s, il, ol, t), w in zip(arcs, weights):
            if il == wid and dist[s] + w < nxt[t]:
                nxt[t] = dist[s] + w
        dist = eps_closure(nxt)
    return min(d + f for d, f in zip(dist, finals))


# NOTE: the test LM is built anomaly-free (every explicit n-gram is
# cheaper than its backoff route).  On anomalous ARPA files the
# nondeterministic G gives min-cost <= exact backoff score — the same
# property real arpa2fst output has.
def test_fst_matches_backoff_scoring():
    lm = _lm()
    start, n, arcs, weights, finals, w2i = arpa_to_fst_arrays(lm)
    arcs = [tuple(a) for a in arcs]
    for sent in (["a", "b"], ["a", "a"], ["b"], ["a", "b", "a"]):
        expect = -LN10 * sentence_logprob(lm, sent)
        got = _path_cost(start, n, arcs, weights, finals,
                         [w2i[w] for w in sent])
        assert got == pytest.approx(expect, abs=1e-4), sent


def test_cli_roundtrip(tmp_path):
    import contextlib
    import json as _json

    from kaldi_ctc_tpu.cli import graph_tool, lm_tool

    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    g = str(tmp_path / "G.fst")
    lm_tool.main(["arpa-to-fst", "--arpa", str(arpa), "--output", g])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        graph_tool.main(["info", "--graph", g])
    info = _json.loads(buf.getvalue())
    assert info["num_states"] >= 3 and info["num_arcs"] >= 5

    text = tmp_path / "text"
    text.write_text("utt1 a b\nutt2 a a\n")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lm_tool.main(["perplexity", "--arpa", str(arpa),
                      "--text", str(text)])
    out = _json.loads(buf.getvalue())
    assert out["num_utts"] == 2
    assert out["log10prob"] == pytest.approx(-0.9 + -1.9)


def test_sparse_symbol_table_no_id_collision():
    """Caller tables with sparse ids must not hand a new word an
    existing id (regression: len() allocation collided)."""
    import io as _io
    lm = parse_arpa(_io.StringIO(ARPA))
    table = {"<eps>": 0, "a": 5}   # sparse: len()=2 would collide later
    start, n, arcs, w, finals, out_table = arpa_to_fst_arrays(lm, table)
    ids = list(out_table.values())
    assert len(ids) == len(set(ids)), out_table
    assert out_table["a"] == 5
    assert out_table["b"] == 6     # next free, not len(table)

"""Character-CTC configuration (BASELINE.json configs: "CTC-character
librispeech"): the flat-start route with a spelling lexicon — units are
letters, no phones and no GMM anywhere.  Covers egs generation, training,
native char-TLG build, and word decoding through letter units."""

import contextlib
import io
import json

import numpy as np


ARPA = """\\data\\
ngram 1=5

\\1-grams:
-0.5 <s>
-0.5 </s>
-0.5 cab
-0.5 be
-0.8 ace

\\end\\
"""


def test_char_ctc_flat_start(tmp_path):
    from kaldi_ctc_tpu.cli import decode_ctc, graph_tool, prepare_egs, train_ctc
    from kaldi_ctc_tpu.utils import kaldi_io

    words = ["cab", "be", "ace"]
    # spelling lexicon: each word is its letter sequence
    letters = sorted(set("".join(words)))
    char_ids = {c: i + 1 for i, c in enumerate(letters)}  # 0 = blank
    lex_path = tmp_path / "lexicon.txt"
    lex_path.write_text(
        "\n".join(f"{w} {' '.join(w)}" for w in words) + "\n")
    phones_path = tmp_path / "chars.txt"
    phones_path.write_text(
        "\n".join(f"{c} {i}" for c, i in char_ids.items()) + "\n")
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text(ARPA)

    rng = np.random.default_rng(0)
    fark = tmp_path / "feats.ark"
    lines = []
    D = 8
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw:
        for i in range(16):
            ws = []
            for _ in range(int(rng.integers(1, 4))):
                w = words[int(rng.integers(len(words)))]
                while ws and w == ws[-1]:
                    w = words[int(rng.integers(len(words)))]
                ws.append(w)
            chars = [char_ids[c] for w in ws for c in w]
            span = 8
            t = len(chars) * span
            feats = rng.standard_normal((t, D)).astype(np.float32) * 0.1
            for j, ch in enumerate(chars):
                feats[j * span:(j + 1) * span, ch % D] += 2.0
            fw[f"utt{i}"] = feats
            lines.append(f"utt{i} {' '.join(ws)}")
    text_path = tmp_path / "text"
    text_path.write_text("\n".join(lines) + "\n")

    egs = tmp_path / "egs.ark"
    prepare_egs.main([
        "get", "--feats", f"ark:{fark}", "--text", str(text_path),
        "--lexicon", str(lex_path), "--phones", str(phones_path),
        "--output", f"ark:{egs}"])

    exp = str(tmp_path / "exp_char")
    train_ctc.main([
        "--egs", f"ark:{egs}", "--num-targets", str(len(letters) + 1),
        "--hidden-dim", "24", "--num-layers", "2",
        "--epochs", "300", "--minibatch-size", "16",
        "--initial-learning-rate", "3e-2", "--final-learning-rate", "3e-3",
        "--momentum", "0.9", "--dir", exp, "--checkpoint-period", "100"])

    tlg = str(tmp_path / "charTLG.fst")
    graph_tool.main([
        "make-tlg", "--lexicon", str(lex_path), "--arpa", str(arpa_path),
        "--phones", str(phones_path), "--output", tlg])

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

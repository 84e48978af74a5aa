"""End-to-end CLI integration test — the 'yesno-class' milestone.

Builds a tiny synthetic dataset in Kaldi formats on disk, trains via the
CLI driver, evaluates with compute_prob, decodes with decode_ctc, and
checks the model actually learned (label error rate ≈ 0 on train data).
"""

import json
import os

import numpy as np
import pytest

from kaldi_ctc_tpu.utils import kaldi_io

NUM_TARGETS = 6   # 5 pdfs + blank
D = 8


def _make_dataset(tmp_path, n_utts=16, seed=0):
    """Features paint the active label onto a channel (learnable mapping)."""
    rng = np.random.default_rng(seed)
    fark, aark = tmp_path / "feats.ark", tmp_path / "ali.ark"
    text = tmp_path / "text"
    lines = []
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw, \
         kaldi_io.IntVectorWriter(f"ark:{aark}") as aw:
        for i in range(n_utts):
            n_labs = int(rng.integers(2, 5))
            pdfs = rng.integers(0, NUM_TARGETS - 1, size=n_labs)
            span = 8
            t = n_labs * span
            feats = rng.standard_normal((t, D)).astype(np.float32) * 0.1
            ali = np.zeros(t, np.int32)
            for j, pdf in enumerate(pdfs):
                feats[j * span:(j + 1) * span, (pdf + 1) % D] += 2.0
                ali[j * span:(j + 1) * span] = pdf
            fw[f"utt{i}"] = feats
            aw[f"utt{i}"] = ali
            # expected collapsed labels (pdf+1), consecutive dupes merged
            labs = []
            for p in pdfs:
                if not labs or labs[-1] != p + 1:
                    labs.append(int(p) + 1)
            lines.append(f"utt{i} {' '.join(map(str, labs))}")
    text.write_text("\n".join(lines) + "\n")
    return str(fark), str(aark), str(text)


@pytest.mark.slow
def test_cli_train_eval_decode(tmp_path):
    from kaldi_ctc_tpu.cli import compute_prob, decode_ctc, model_info, train_ctc

    fark, aark, text = _make_dataset(tmp_path)
    exp = str(tmp_path / "exp")

    train_ctc.main([
        "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--num-targets", str(NUM_TARGETS),
        "--hidden-dim", "24", "--num-layers", "2",
        "--epochs", "300", "--minibatch-size", "16",
        "--initial-learning-rate", "3e-2", "--final-learning-rate", "3e-3",
        "--momentum", "0.9",
        "--dir", exp, "--checkpoint-period", "100",
    ])
    assert os.path.exists(os.path.join(exp, "model_config.json"))
    assert os.path.isdir(os.path.join(exp, "checkpoints"))

    # model_info runs
    model_info.main(["--dir", exp])

    # compute_prob on the training egs: accuracy should be high
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        compute_prob.main([
            "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
            "--dir", exp, "--minibatch-size", "8",
        ])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["accuracy"] > 0.95, out

    # decode and score
    hyp_path = str(tmp_path / "hyps.txt")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_ctc.main([
            "--feats", f"ark:{fark}", "--dir", exp,
            "--method", "beam", "--beam", "4", "--prune-k", "4",
            "--use-priors", "0", "--blank-threshold", "1.0",
            "--text", text, "--output", hyp_path,
            "--minibatch-size", "8",
        ])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result["label_error_rate"] < 0.05, result
    assert os.path.exists(hyp_path)

    # WFST decode through a word-loop CTC graph: words ≡ labels 1..5
    import numpy as np
    from kaldi_ctc_tpu.decoding.wfst import NativeFst
    # HCLG-like: entering label l emits word l and lands on a state with a
    # label-l self-loop (sustained frames loop, like add-self-loops output)
    arcs, weights = [], []
    for lab in range(1, NUM_TARGETS):
        s = lab  # state id for this label
        arcs.append([0, lab, lab, s]); weights.append(1.0)  # word arc: LM cost
        arcs.append([s, lab, 0, s]); weights.append(0.0)    # self-loop
        arcs.append([s, 0, 0, 0]); weights.append(0.0)      # eps back
    n_states = NUM_TARGETS
    finals = np.full(n_states, np.inf, np.float32)
    finals[0] = 0.0
    base = NativeFst.from_arrays(0, n_states, np.asarray(arcs, np.int32),
                                 np.asarray(weights, np.float32), finals)
    ctc_graph = base.make_ctc_graph()
    graph_path = str(tmp_path / "ctc.fst")
    ctc_graph.write(graph_path)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_ctc.main([
            "--feats", f"ark:{fark}", "--dir", exp,
            "--method", "wfst", "--graph", graph_path,
            "--use-priors", "0", "--blank-threshold", "0.98",
            "--text", text, "--minibatch-size", "8",
        ])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    # blank-threshold frame dropping is slightly lossy (reference behavior)
    assert result["label_error_rate"] < 0.1, result

    # lattice decode + LM-weight WER sweep (score.sh analogue)
    from kaldi_ctc_tpu.cli import score_lattices
    lat_path = str(tmp_path / "lat.ark.txt")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_ctc.main([
            "--feats", f"ark:{fark}", "--dir", exp,
            "--method", "wfst", "--graph", graph_path,
            "--use-priors", "0", "--blank-threshold", "0.98",
            "--lattice", lat_path, "--lattice-beam", "10",
            "--text", text, "--minibatch-size", "8",
        ])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result["label_error_rate"] < 0.1, result
    assert os.path.exists(lat_path)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        score_lattices.main([
            "--lattices", lat_path, "--text", text,
            "--min-lmwt", "1", "--max-lmwt", "3",
        ])
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert "best_wer" in lines[-1]
    assert lines[-1]["best_wer"] < 0.1, lines


def test_cli_layer_growth_bf16(tmp_path):
    """Growth schedule + dropout + bf16 compute through the CLI surface."""
    from kaldi_ctc_tpu.cli import train_ctc

    fark, aark, text = _make_dataset(tmp_path, n_utts=8, seed=3)
    exp = str(tmp_path / "exp_grow")
    train_ctc.main([
        "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--num-targets", str(NUM_TARGETS),
        "--hidden-dim", "16", "--num-layers", "3",
        "--start-layers", "1", "--add-layers-period", "4",
        "--dropout", "0.1", "--compute-dtype", "bfloat16",
        "--epochs", "12", "--minibatch-size", "8",
        "--initial-learning-rate", "1e-2", "--final-learning-rate", "1e-2",
        "--dir", exp, "--checkpoint-period", "6",
    ])
    cfg = json.loads(
        open(os.path.join(exp, "model_config.json")).read())
    assert cfg["num_layers"] == 3, cfg
    assert cfg["compute_dtype"] == "bfloat16"
    # resume restores the grown (3-layer) tree without error
    train_ctc.main([
        "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--num-targets", str(NUM_TARGETS),
        "--hidden-dim", "16", "--num-layers", "3",
        "--start-layers", "1", "--add-layers-period", "4",
        "--dropout", "0.1", "--compute-dtype", "bfloat16",
        "--epochs", "12", "--minibatch-size", "8",
        "--initial-learning-rate", "1e-2", "--final-learning-rate", "1e-2",
        "--dir", exp, "--checkpoint-period", "6", "--resume",
    ])
    # model tools reconcile the template with each checkpoint's saved
    # layer count (growth rewrote model_config.json to 3 layers, but
    # step-6 checkpoints may predate the final growth)
    from kaldi_ctc_tpu.cli import copy_model, model_info
    import contextlib as _ctx
    import io as _io
    from kaldi_ctc_tpu.training.checkpoint import latest_step, read_meta
    ckpt_dir = os.path.join(exp, "checkpoints")
    steps = sorted(int(p.name.split("_")[1])
                   for p in (tmp_path / "exp_grow" / "checkpoints").iterdir())
    for s in steps:
        buf = _io.StringIO()
        with _ctx.redirect_stdout(buf):
            model_info.main(["--dir", exp, "--step", str(s)])
        info = json.loads(buf.getvalue())
        assert info["num_layers"] == read_meta(ckpt_dir, step=s)[
            "extra"]["num_layers"], (s, info)
    # export works from a pre-growth checkpoint too
    pre = next(s for s in steps
               if read_meta(ckpt_dir, step=s)["extra"]["num_layers"] < 3)
    copy_model.main(["--dir", exp, "--step", str(pre),
                     "--output", str(tmp_path / "pre.npz")])
    from kaldi_ctc_tpu.models.artifact import load_inference_artifact
    _params, art_cfg, _pri = load_inference_artifact(
        str(tmp_path / "pre.npz"))
    assert art_cfg.num_layers < 3


def test_cli_adjust_priors(tmp_path):
    import numpy as np
    from kaldi_ctc_tpu.cli import adjust_priors, train_ctc

    fark, aark, text = _make_dataset(tmp_path, n_utts=8, seed=5)
    exp = str(tmp_path / "exp_pri")
    train_ctc.main([
        "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--num-targets", str(NUM_TARGETS),
        "--hidden-dim", "16", "--num-layers", "1",
        "--epochs", "20", "--minibatch-size", "8",
        "--initial-learning-rate", "1e-2", "--final-learning-rate", "1e-2",
        "--dir", exp, "--checkpoint-period", "10",
    ])
    # google-const mode
    adjust_priors.main(["--dir", exp, "--google-prior-const", "9"])
    pri = np.load(os.path.join(exp, "priors.npy"))
    assert pri.shape == (NUM_TARGETS,)
    assert pri[0] == 9.0 and np.all(pri[1:] == 1.0)
    # posterior mode: normalized, positive, blank-dominated (early training)
    adjust_priors.main(["--dir", exp, "--feats", f"ark:{fark}"])
    pri = np.load(os.path.join(exp, "priors.npy"))
    assert pri.shape == (NUM_TARGETS,)
    assert abs(pri.sum() - 1.0) < 1e-3
    assert np.all(pri > 0)
    # label-count mode (train.sh:495-503): counts of collapsed+shifted
    # labels plus one blank per label, normalized
    adjust_priors.main(["--dir", exp, "--ali", f"ark:{aark}"])
    pri = np.load(os.path.join(exp, "priors.npy"))
    from kaldi_ctc_tpu.data.egs import collapse_alignment
    from kaldi_ctc_tpu.utils.kaldi_io import SequentialIntVectorReader
    counts = np.zeros(NUM_TARGETS)
    for _k, ali in SequentialIntVectorReader(f"ark:{aark}"):
        lab = collapse_alignment(np.asarray(ali))
        counts += np.bincount(lab, minlength=NUM_TARGETS)
        counts[0] += lab.size
    np.testing.assert_allclose(pri, counts / counts.sum(), rtol=1e-5)
    # decode picks the priors file up without error
    from kaldi_ctc_tpu.cli import decode_ctc
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_ctc.main([
            "--feats", f"ark:{fark}", "--dir", exp,
            "--method", "greedy", "--use-priors", "1",
            "--text", text, "--minibatch-size", "8",
        ])
    json.loads(buf.getvalue().strip().splitlines()[-1])


def test_lattice_tool_chain(tmp_path):
    """copy/scale/prune/determinize/best-path/info over a real archive."""
    import io, contextlib
    import numpy as np
    from kaldi_ctc_tpu.cli import lattice_tool
    from kaldi_ctc_tpu.decoding.lattice import (
        LatticeWriter, decode_lattice)
    from kaldi_ctc_tpu.decoding.wfst import NativeFst

    arcs, weights = [], []
    for lab in range(1, 4):
        s = lab
        arcs.append([0, lab, lab, s]); weights.append(1.0)
        arcs.append([s, lab, 0, s]); weights.append(0.0)
        arcs.append([s, 0, 0, 0]); weights.append(0.0)
    finals = np.full(4, np.inf, np.float32)
    finals[0] = 0.0
    g = NativeFst.from_arrays(0, 4, np.asarray(arcs, np.int32),
                              np.asarray(weights, np.float32),
                              finals).make_ctc_graph()
    rng = np.random.default_rng(3)
    raw = str(tmp_path / "raw.ark.txt")
    with LatticeWriter(raw) as w:
        for i in range(3):
            scores = rng.standard_normal((10, 4)).astype(np.float32) * 2
            w[f"u{i}"] = decode_lattice(g, scores, lattice_beam=8.0)

    out = str(tmp_path / "o.ark.txt")
    lattice_tool.main(["scale", "--lattices", raw, "--output", out,
                       "--acoustic-scale", "0.5"])
    lattice_tool.main(["prune", "--lattices", out, "--output", out,
                       "--beam", "3"])
    det = str(tmp_path / "det.ark.txt")
    lattice_tool.main(["determinize", "--lattices", raw, "--output", det,
                       "--det-beam", "4"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lattice_tool.main(["info", "--lattices", det, "--compact", "1"])
    info = json.loads(buf.getvalue())
    assert info["num_lattices"] == 3
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lattice_tool.main(["best-path", "--lattices", det, "--compact", "1"])
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 3 and all(l.startswith("u") for l in lines)


def test_init_model_graph_tool_nnet_compute(tmp_path):
    """init_model -> train --resume -> nnet_compute -> graph_tool chain."""
    import io, contextlib
    import numpy as np
    from kaldi_ctc_tpu.cli import (
        graph_tool, init_model, nnet_compute, train_ctc)
    from kaldi_ctc_tpu.utils import kaldi_io

    fark, aark, text = _make_dataset(tmp_path, n_utts=8, seed=11)
    exp = str(tmp_path / "exp_init")
    init_model.main([
        "--dir", exp, "--input-dim", str(D),
        "--num-targets", str(NUM_TARGETS),
        "--hidden-dim", "16", "--num-layers", "1",
    ])
    assert os.path.exists(os.path.join(exp, "checkpoints", "step_0"))
    pri = np.load(os.path.join(exp, "priors.npy"))
    assert pri[0] == 9.0
    # train picks up the initialized model
    train_ctc.main([
        "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--num-targets", str(NUM_TARGETS),
        "--hidden-dim", "16", "--num-layers", "1",
        "--epochs", "5", "--minibatch-size", "8",
        "--dir", exp, "--checkpoint-period", "5", "--resume",
    ])
    # forward dump
    out = str(tmp_path / "post.ark")
    nnet_compute.main([
        "--feats", f"ark:{fark}", "--dir", exp,
        "--output", f"ark:{out}", "--what", "post",
    ])
    dumped = dict(kaldi_io.SequentialMatrixReader(f"ark:{out}"))
    assert len(dumped) == 8
    first = next(iter(dumped.values()))
    assert first.shape[1] == NUM_TARGETS
    np.testing.assert_allclose(first.sum(axis=1), 1.0, atol=1e-4)

    # graph_tool: build a CTC graph from a base FST and inspect it
    from kaldi_ctc_tpu.decoding.wfst import NativeFst
    arcs = [[0, 1, 1, 0]]
    finals = np.asarray([0.0], np.float32)
    base = NativeFst.from_arrays(0, 1, np.asarray(arcs, np.int32),
                                 np.zeros(1, np.float32), finals)
    gp = str(tmp_path / "g.fst")
    base.write(gp)
    cp = str(tmp_path / "ctc.fst")
    graph_tool.main(["make-ctc", "--graph", gp, "--output", cp])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        graph_tool.main(["info", "--graph", cp])
    info = json.loads(buf.getvalue())
    assert info["num_states"] > 1


def test_nonfinite_action_cli(tmp_path):
    """train_ctc --nonfinite-action: abort raises (reference KALDI_ERR
    semantics), skip completes and records the skipped batch."""
    from kaldi_ctc_tpu.cli import train_ctc

    fark, aark, _ = _make_dataset(tmp_path, n_utts=8, seed=3)
    # poison one utterance with a NaN feature
    feats = dict(kaldi_io.SequentialMatrixReader(f"ark:{fark}"))
    k = sorted(feats)[0]
    feats[k] = feats[k].copy()
    feats[k][0, 0] = np.nan
    bad = tmp_path / "feats_nan.ark"
    with kaldi_io.MatrixWriter(f"ark:{bad}") as w:
        for key, m in feats.items():
            w[key] = m

    common = ["--ali", f"ark:{aark}", "--num-targets", str(NUM_TARGETS),
              "--hidden-dim", "8", "--num-layers", "1",
              "--epochs", "2", "--minibatch-size", "8",
              "--checkpoint-period", "1000"]
    with pytest.raises(RuntimeError, match="non-finite"):
        train_ctc.main(["--feats", f"ark:{bad}",
                        "--dir", str(tmp_path / "exp_abort"),
                        "--nonfinite-action", "abort"] + common)

    exp = tmp_path / "exp_skip"
    train_ctc.main(["--feats", f"ark:{bad}", "--dir", str(exp),
                    "--nonfinite-action", "skip"] + common)
    lines = [json.loads(l) for l in
             (exp / "metrics.jsonl").read_text().splitlines()]
    assert any(l.get("event") == "skipped_nonfinite" for l in lines)

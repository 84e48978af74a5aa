"""Multi-process SPMD training through the launch CLI (the run.pl
analogue): 2 coordinated jax.distributed CPU processes train one model,
and the result decodes like a single-process run."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from kaldi_ctc_tpu.utils import kaldi_io


def _make_dataset(tmp_path, n=8):
    rng = np.random.default_rng(0)
    lines = []
    with kaldi_io.MatrixWriter(f"ark:{tmp_path}/feats.ark") as fw, \
            kaldi_io.IntVectorWriter(f"ark:{tmp_path}/ali.ark") as aw:
        for i in range(n):
            labs = [1 + (i + j) % 3 for j in range(3)]   # pdf ids
            t = len(labs) * 8
            f = rng.standard_normal((t, 6)).astype(np.float32) * 0.1
            for j, lab in enumerate(labs):
                f[j * 8:(j + 1) * 8, lab] += 2.0
            fw[f"u{i}"] = f
            aw[f"u{i}"] = np.repeat(labs, 8).astype(np.int32)
            # reference transcripts in output-label space (pdf + 1)
            lines.append(f"u{i} {' '.join(str(p + 1) for p in labs)}")
    (tmp_path / "text").write_text("\n".join(lines) + "\n")


@pytest.mark.slow
def test_launch_two_process_training(tmp_path):
    _make_dataset(tmp_path)
    exp = tmp_path / "exp_mp"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # each process gets 2 virtual devices -> a 2-process, 4-device DP mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    r = subprocess.run(
        [sys.executable, "-m", "kaldi_ctc_tpu.cli.launch",
         "--num-processes", "2", "--port", "29517", "--",
         sys.executable, "-m", "kaldi_ctc_tpu.cli.train_ctc",
         "--feats", f"ark:{tmp_path}/feats.ark",
         "--ali", f"ark:{tmp_path}/ali.ark",
         "--num-targets", "5", "--hidden-dim", "16", "--num-layers", "1",
         "--epochs", "200", "--minibatch-size", "8",
         "--initial-learning-rate", "3e-2",
         "--final-learning-rate", "3e-3", "--momentum", "0.9",
         "--dir", str(exp), "--checkpoint-period", "1000"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    # only the primary writes the experiment artifacts
    assert (exp / "model_config.json").exists()
    ckpts = sorted((exp / "checkpoints").iterdir())
    assert ckpts, "no checkpoint written by the primary process"

    # the jointly-trained model decodes the training data correctly
    env2 = dict(os.environ)
    env2["JAX_PLATFORMS"] = "cpu"
    r2 = subprocess.run(
        [sys.executable, "-m", "kaldi_ctc_tpu.cli.decode_ctc",
         "--feats", f"ark:{tmp_path}/feats.ark", "--dir", str(exp),
         "--method", "greedy", "--use-priors", "0",
         "--text", f"{tmp_path}/text"],
        env=env2, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-3000:]
    result = json.loads(r2.stdout.strip().splitlines()[-1])
    assert result["label_error_rate"] < 0.1, result

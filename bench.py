"""Benchmark: training throughput of the flagship BLSTM-CTC model.

Measures audio-seconds of speech processed per second per chip on the
librispeech 'google' training configuration (5-layer BLSTM cell 320/dir,
minibatch 48, 700-raw-frame utterances at frame_subsampling_factor 3 →
240 subsampled frames ≈ 7.2 s audio per utterance; run.sh:148-151).

Baseline: the reference trained librispeech-960 ×3 speed-perturb ×5 epochs
in 17h43m35s on 3 GPUs (reports/ctc-google/accuracy.log final line) →
51.84e6 audio-s / 63815 s / 3 ≈ 271 audio-s/s per GPU.

K train steps are fused under one jit (lax.scan) and only a scalar is
fetched, so per-dispatch/transfer overhead of remote backends does not
pollute the measurement.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_AUDIO_S_PER_S_PER_CHIP = 271.0

# flagship training shapes (run.sh:148-151: mb 48, max 700 frames, fs 3)
BATCH = 48
FRAMES = 240          # subsampled frames (700/3, padded up for tiling)
SECONDS_PER_FRAME = 0.03  # 10 ms shift × frame_subsampling_factor 3
STEPS_PER_CALL = 5
TIMED_CALLS = 4


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from kaldi_ctc_tpu.models import init_am_params
    from kaldi_ctc_tpu.training import (
        TrainOptions, build_train_step, init_train_state)

    cfg = _flagship_cfg()
    rng = np.random.default_rng(0)
    lmax = 70
    batch = {
        "feats": jnp.asarray(
            rng.standard_normal((BATCH, FRAMES, cfg.input_dim)).astype(
                np.float32)),
        "labels": jnp.asarray(
            rng.integers(1, cfg.num_targets, (BATCH, lmax)).astype(np.int32)),
        "input_lens": jnp.full((BATCH,), FRAMES, jnp.int32),
        "label_lens": jnp.full((BATCH,), lmax, jnp.int32),
    }

    step_fn = build_train_step(cfg, TrainOptions())

    @jax.jit
    def run_k(state, batch):
        def body(s, _):
            s2, m = step_fn(s, batch)
            return s2, m["loss_total"]
        state, losses = jax.lax.scan(body, state, None, length=STEPS_PER_CALL)
        return state, losses[-1]

    params = init_am_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params)

    # warmup (compile) — scalar fetch forces real completion
    state, loss = run_k(state, batch)
    _ = float(loss)

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state, loss = run_k(state, batch)
        _ = float(loss)  # sync point; scalar transfer is negligible
    elapsed = time.perf_counter() - t0

    n_steps = STEPS_PER_CALL * TIMED_CALLS
    audio_s_per_step = BATCH * FRAMES * SECONDS_PER_FRAME
    audio_s_per_s = audio_s_per_step * n_steps / elapsed
    n_chips = len(jax.devices())
    per_chip = audio_s_per_s / n_chips

    print(json.dumps({
        "metric": "train_throughput_audio_seconds_per_second_per_chip",
        "value": round(per_chip, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(per_chip / BASELINE_AUDIO_S_PER_S_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()

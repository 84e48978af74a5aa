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

--scaling: the SURVEY §5.8 scaling harness — weak-scaling DP over the
local device mesh (global batch = 48 × n_devices, batch dim sharded over
the 'data' axis), reporting per-chip throughput at 1 device and at all
devices plus the parallel efficiency.  `--cpu 8` forces a virtual
8-device CPU mesh (the axon plugin ignores JAX_PLATFORMS, so this is a
flag) to validate the DP path without a pod:
  python bench.py --scaling --tiny --cpu 8
On real multi-chip hardware plain `--scaling` measures ICI scaling.
"""

import json
import sys
import time

import numpy as np

BASELINE_AUDIO_S_PER_S_PER_CHIP = 271.0

# flagship training shapes (run.sh:148-151: mb 48, max 700 frames, fs 3)
BATCH = 48
FRAMES = 240          # subsampled frames (700/3, padded up for tiling)
SECONDS_PER_FRAME = 0.03  # 10 ms shift × frame_subsampling_factor 3
# Enough fused steps per dispatch that the axon tunnel's ~25 ms
# per-call overhead (a dev-harness artifact, not chip time) is < 2% of
# the measurement: at ~12 ms/step, 40 steps ≈ 480 ms per dispatch.
STEPS_PER_CALL = 40
TIMED_CALLS = 3


def _measure(devices, batch_per_chip=BATCH, tiny=False, ds2=False,
             bf16=False):
    """→ audio-s/s/chip with DP over the given devices."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from kaldi_ctc_tpu.models import init_am_params
    from kaldi_ctc_tpu.parallel.mesh import data_sharding, make_mesh
    from kaldi_ctc_tpu.training import (
        TrainOptions, build_train_step, init_train_state)

    import dataclasses
    cfg = _flagship_cfg(tiny=tiny)
    if ds2:
        # DS2 family at the same recurrent scale: the conv front end's
        # 2x time stride halves the sequential BLSTM length
        cfg = dataclasses.replace(cfg, conv_layers=2, conv_channels=32,
                                  conv_time_stride=2)
    if bf16:
        # mixed precision: bf16-stored projections/outputs/dgates, f32
        # gate math, carries, params and accumulation
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    n_dev = len(devices)
    b = batch_per_chip * n_dev
    frames = 48 if tiny else FRAMES
    lmax = 8 if tiny else 70
    steps_per_call = 3 if tiny else STEPS_PER_CALL
    timed_calls = 2 if tiny else TIMED_CALLS
    rng = np.random.default_rng(0)
    batch_np = {
        "feats": rng.standard_normal((b, frames, cfg.input_dim)).astype(
            np.float32),
        "labels": rng.integers(1, cfg.num_targets, (b, lmax)).astype(
            np.int32),
        "input_lens": np.full((b,), frames, np.int32),
        "label_lens": np.full((b,), lmax, np.int32),
    }
    mesh = make_mesh(devices=list(devices))
    sh = data_sharding(mesh)
    batch = {k: jax.device_put(v, sh) for k, v in batch_np.items()}

    step_fn = build_train_step(cfg, TrainOptions())

    @jax.jit
    def run_k(state, batch):
        def body(s, _):
            s2, m = step_fn(s, batch)
            return s2, m["loss_total"]
        state, losses = jax.lax.scan(body, state, None,
                                     length=steps_per_call)
        return state, losses[-1]

    params = init_am_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params)
    # replicate params over the mesh so DP shards only the batch
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    state = jax.device_put(state, rep)

    state, loss = run_k(state, batch)   # warmup (compile)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(timed_calls):
        state, loss = run_k(state, batch)
        _ = float(loss)                 # sync point
    elapsed = time.perf_counter() - t0

    n_steps = steps_per_call * timed_calls
    audio_s_per_step = b * frames * SECONDS_PER_FRAME
    return audio_s_per_step * n_steps / elapsed / n_dev


REFERENCE_DECODE_RTF = 0.055 / 3.0  # README.md:51-54: "(0.05-0.06) /
# frame_subsampling_factor" with the headline fs=3 run — i.e. ~0.018
# per second of audio, measured WITH the GPU forward pass included.


def _decode_bench(words=100_000, ppw=6, phones=41, utts=16, frames=1000):
    """Reproducible WFST decode RTF on a TLG-scale synthetic task.

    Builds a `words`-word loop graph (each word a `ppw`-phone chain →
    ~words*ppw*2 states after the CTC transform, the scale of a real
    tgsmall TLG), synthesizes CTC-shaped posteriors (sharp label spikes
    on a blank-dominated background), applies the reference's
    blank-threshold frame skipping (nnet2-ctc-latgen-faster
    --blank-threshold 0.98, run_ctc_phone.sh:38) and measures the native
    token-passing decoder at the recipe's operating point (beam 16 is
    decode.sh's effective best-path beam; max-active 7000).
    """
    from kaldi_ctc_tpu.decoding.lattice import decode_lattice
    from kaldi_ctc_tpu.decoding.wfst import (
        NativeFst, decode_best_path, decode_best_path_batch)

    rng = np.random.default_rng(0)
    a_cols = phones + 1  # blank + phones

    # deterministic word-loop graph: a phone-prefix trie over the
    # lexicon (what L∘G determinization produces — bounded out-degree,
    # unlike a naive per-word fan-out from the loop state), word olabel
    # + unigram LM weight on the leaf arc back to the loop state
    pron = rng.integers(1, phones + 1, size=(words, ppw)).astype(np.int32)
    # dedupe identical pronunciations (expected ~1 collision at 100k
    # draws): two words sharing a full pron would emit a nondeterministic
    # arc pair from the same trie state
    pron = np.unique(pron, axis=0)
    words = pron.shape[0]
    t0 = time.perf_counter()
    trie = {}  # (state, phone) -> next state
    arcs_l, weights_l = [], []
    lm_cost = float(np.log(float(words)))
    n_states = 1
    for w in range(words):
        s = 0
        for p in range(ppw - 1):
            key = (s, int(pron[w, p]))
            nxt = trie.get(key)
            if nxt is None:
                nxt = n_states
                n_states += 1
                trie[key] = nxt
                arcs_l.append((s, int(pron[w, p]), 0, nxt))
                weights_l.append(0.0)
            s = nxt
        # leaf arc: last phone, word olabel, LM weight, back to loop
        arcs_l.append((s, int(pron[w, ppw - 1]), w + 1, 0))
        weights_l.append(lm_cost)
    arcs = np.asarray(arcs_l, np.int32)
    weights = np.asarray(weights_l, np.float32)
    finals = np.full(n_states, np.inf, np.float32)
    finals[0] = 0.0
    graph = NativeFst.from_arrays(
        0, n_states, arcs, weights, finals).make_ctc_graph()
    build_s = time.perf_counter() - t0

    # CTC-shaped posteriors: ~45% label-spike frames, rest blank>0.98
    def make_scores():
        labels = rng.integers(1, phones + 1, size=frames)
        spike = rng.random(frames) < 0.45
        post = np.full((frames, a_cols), 1e-4, np.float32)
        post[:, 0] = 0.99
        rows = np.where(spike)[0]
        post[rows, 0] = 0.05
        post[rows, labels[rows]] = 0.75
        post /= post.sum(axis=1, keepdims=True)
        logp = np.log(post)
        # reference blank-skip: drop frames with blank post >= 0.98
        return np.ascontiguousarray(logp[post[:, 0] < 0.98])

    scores = [make_scores() for _ in range(utts)]
    audio_s = utts * frames * SECONDS_PER_FRAME
    kept = sum(s.shape[0] for s in scores) / (utts * frames)

    for s in scores[:2]:
        decode_best_path(graph, s)          # warm the code path
    t0 = time.perf_counter()
    for s in scores:
        w, _, _, ok = decode_best_path(graph, s)
        assert ok and len(w) > 0
    rtf_1t = (time.perf_counter() - t0) / audio_s

    t0 = time.perf_counter()
    res = decode_best_path_batch(graph, scores)
    assert all(r[3] for r in res)
    rtf_batch = (time.perf_counter() - t0) / audio_s

    t0 = time.perf_counter()
    for s in scores[:4]:
        decode_lattice(graph, s, lattice_beam=10.0)
    rtf_lat = (time.perf_counter() - t0) / (4 * frames * SECONDS_PER_FRAME)

    print(json.dumps({
        "metric": "wfst_decode_rtf",
        "value": round(rtf_1t, 4), "unit": "rtf",
        "graph_states": graph.num_states, "graph_arcs": graph.num_arcs,
        "graph_build_s": round(build_s, 2),
        "kept_frame_fraction": round(kept, 3),
        "rtf_batch_threaded": round(rtf_batch, 4),
        "rtf_lattice": round(rtf_lat, 4),
        "vs_baseline": round(REFERENCE_DECODE_RTF / rtf_1t, 3),
    }))


def main():
    if "--decode" in sys.argv:
        _decode_bench()
        return
    if "--cpu" in sys.argv:
        n = int(sys.argv[sys.argv.index("--cpu") + 1])
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n)
    import jax

    ds2 = "--ds2" in sys.argv
    bf16 = "--bf16" in sys.argv
    if "--scaling" in sys.argv:
        tiny = "--tiny" in sys.argv
        devs = jax.devices()
        suffix = ("_ds2" if ds2 else "") + ("_bf16" if bf16 else "")
        one = _measure(devs[:1], tiny=tiny, ds2=ds2, bf16=bf16)
        print(json.dumps({
            "metric": "train_throughput_audio_seconds_per_second_per_chip"
                      + suffix,
            "value": round(one, 2), "unit": "audio-s/s/chip",
            "devices": 1,
            "vs_baseline": round(one / BASELINE_AUDIO_S_PER_S_PER_CHIP,
                                 3)}))
        if len(devs) > 1:
            full = _measure(devs, tiny=tiny, ds2=ds2, bf16=bf16)
            print(json.dumps({
                "metric":
                    "train_throughput_audio_seconds_per_second_per_chip"
                    + suffix,
                "value": round(full, 2), "unit": "audio-s/s/chip",
                "devices": len(devs),
                "scaling_efficiency": round(full / one, 3),
                "vs_baseline": round(
                    full / BASELINE_AUDIO_S_PER_S_PER_CHIP, 3)}))
        return

    per_chip = _measure(jax.devices()[:1], ds2=ds2, bf16=bf16)
    print(json.dumps({
        "metric": "train_throughput_audio_seconds_per_second_per_chip"
                  + ("_ds2" if ds2 else "") + ("_bf16" if bf16 else ""),
        "value": round(per_chip, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(per_chip / BASELINE_AUDIO_S_PER_S_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()

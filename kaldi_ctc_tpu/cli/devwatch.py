"""Device-init watchdog launcher: ``python -m kaldi_ctc_tpu.cli.devwatch
<module> [args...]``.

Failure-detection wrapper (SURVEY §5.3) for environments where acquiring
the accelerator can wedge: a remote-attached TPU runtime (e.g. a tunneled
chip) occasionally hangs forever inside backend initialisation when a new
client connects in the window where the previous client is still tearing
down — the process sits at ~0 %% CPU waiting on a futex that is never
posted.  Multi-stage recipes (``recipes/*/run.sh``) run one CLI process
per stage back-to-back, which hits exactly that window.

The wrapper probes ``jax.devices()`` from a daemon thread; if the probe
does not complete within ``KCTPU_DEVICE_TIMEOUT`` seconds (default 120)
the process hard-exits with code **66** so the calling script can retry
(a fresh connect after a short delay reliably succeeds).  On success the
target CLI module runs in this same process and reuses the initialised
backend — the probe costs nothing.

The reference's analogue is the GPU-selection retry loop in
``src/cudamatrix/cu-device.cc`` (SelectGpuId retries acquiring a device
before giving up); here acquisition is remote so the failure mode is a
hang rather than an error, hence the watchdog shape.
"""

import os
import runpy
import sys
import threading


EXIT_DEVICE_HANG = 66
EXIT_DEVICE_ERROR = 65


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: python -m kaldi_ctc_tpu.cli.devwatch "
              "<module> [args...]", file=sys.stderr)
        return 2
    timeout = float(os.environ.get("KCTPU_DEVICE_TIMEOUT", "120"))

    done = threading.Event()
    failure = []  # exception from the probe thread, if any

    def probe():
        # enumeration alone is not enough: a wedged remote runtime can
        # list devices fine and then hang on the first real operation,
        # so the probe round-trips an actual tiny computation.  A fast
        # deterministic failure (ImportError, backend init error) must
        # NOT be classified as a wedge — it would otherwise eat the full
        # timeout and trigger pointless caller retries — so exceptions
        # are stashed and reported as a distinct exit code immediately.
        try:
            import jax
            import jax.numpy as jnp
            jax.devices()
            jnp.zeros((8,), jnp.float32).block_until_ready()
        except BaseException as e:  # noqa: BLE001 - report, don't mask
            failure.append(e)
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True, name="devwatch-probe")
    t.start()
    completed = done.wait(timeout)
    if completed and failure:
        print(f"devwatch: device probe failed deterministically "
              f"({type(failure[0]).__name__}: {failure[0]}); exiting "
              f"{EXIT_DEVICE_ERROR} (not a wedge — do not retry)",
              file=sys.stderr, flush=True)
        return EXIT_DEVICE_ERROR
    if not completed:
        print(f"devwatch: jax.devices() did not complete within "
              f"{timeout:.0f}s — device acquisition is wedged; exiting "
              f"{EXIT_DEVICE_HANG} so the caller can retry",
              file=sys.stderr, flush=True)
        # hard exit: the backend-init thread is unkillably blocked in
        # native code, sys.exit would hang on interpreter teardown
        os._exit(EXIT_DEVICE_HANG)

    mod = argv[0]
    sys.argv = [mod] + argv[1:]
    runpy.run_module(mod, run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())

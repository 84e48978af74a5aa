"""Local multi-process SPMD launcher — the run.pl analogue.

Spawns N copies of a command with the jax.distributed environment set
(COORDINATOR_ADDRESS / PROCESS_ID / NUM_PROCESSES), so the multi-host
training path (per-host data shards, cross-process gradient allreduce
over Gloo on CPU or ICI/DCN on TPU pods) runs on one machine:

  python -m kaldi_ctc_tpu.cli.launch --num-processes 2 -- \\
      python -m kaldi_ctc_tpu.cli.train_ctc --feats ... --dir exp

On a real pod slice each host runs the command once instead (the TPU
runtime auto-detects coordination), making this launcher the local
stand-in for the reference's run.pl/queue.pl job spawning
(utils/run.pl:7-29, steps/ctc/train.sh:408-419).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, default=29500)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command to run (prefix with --)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        print("no command given", file=sys.stderr)
        sys.exit(2)
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        env["COORDINATOR_ADDRESS"] = f"localhost:{args.port}"
        env["PROCESS_ID"] = str(pid)
        env["NUM_PROCESSES"] = str(args.num_processes)
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for p in procs:
        p.wait()
        rc = rc or p.returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()

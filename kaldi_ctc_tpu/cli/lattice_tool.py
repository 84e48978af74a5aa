"""Lattice toolbox — copy/scale/prune/best-path/determinize/info.

One CLI covering the latbin tools the CTC recipe touches
(``steps/ctc/decode.sh``, local/score.sh): lattice-copy, lattice-scale
(independent graph/acoustic scaling), lattice-prune (beam pruning around
the best path), lattice-best-path (words + alignment), and the CTC
pruned determinization (``ctc/ctc-graph.cc:245-269``) producing
CompactLattice text archives.

Inputs are text lattice archives as written by ``decode_ctc --lattice``
(raw Lattice) or this tool's ``determinize`` output (CompactLattice).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def parse_args(argv=None):
    from kaldi_ctc_tpu.utils.options import expand_config_args
    argv = expand_config_args(argv)
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("copy", help="read + rewrite a lattice archive")
    c.add_argument("--lattices", required=True)
    c.add_argument("--output", required=True)

    s = sub.add_parser("scale", help="scale graph/acoustic costs")
    s.add_argument("--lattices", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--acoustic-scale", type=float, default=1.0)
    s.add_argument("--lm-scale", type=float, default=1.0)

    pr = sub.add_parser("prune", help="beam-prune around the best path")
    pr.add_argument("--lattices", required=True)
    pr.add_argument("--output", required=True)
    pr.add_argument("--beam", type=float, default=4.0)

    bp = sub.add_parser("best-path", help="words + alignment per utterance")
    bp.add_argument("--lattices", required=True)
    bp.add_argument("--acoustic-scale", type=float, default=1.0)
    bp.add_argument("--lm-scale", type=float, default=1.0)
    bp.add_argument("--words", default=None, help="words.txt symbol table")
    bp.add_argument("--compact", type=int, default=0,
                    help="1: input is a CompactLattice archive")
    bp.add_argument("--output", default=None)

    d = sub.add_parser("determinize",
                       help="pruned determinization -> CompactLattice")
    d.add_argument("--lattices", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--det-beam", type=float, default=10.0)

    i = sub.add_parser("info", help="archive stats")
    i.add_argument("--lattices", required=True)
    i.add_argument("--compact", type=int, default=0)

    return p.parse_args(argv)


def main(argv=None):
    from kaldi_ctc_tpu.decoding.det_lattice import (
        determinize_lattice_pruned, read_compact_lattice_text_ark,
        write_compact_lattice_text)
    from kaldi_ctc_tpu.decoding.lattice import (
        LatticeWriter, read_lattice_text_ark)
    from kaldi_ctc_tpu.utils import get_logger

    args = parse_args(argv)
    log = get_logger("lattice_tool")

    if args.cmd == "copy":
        n = 0
        with LatticeWriter(args.output) as w:
            for key, lat in read_lattice_text_ark(args.lattices):
                w[key] = lat; n += 1
        log.info("copied %d lattices", n)

    elif args.cmd == "scale":
        n = 0
        with LatticeWriter(args.output) as w:
            for key, lat in read_lattice_text_ark(args.lattices):
                w[key] = lat.scale(acoustic_scale=args.acoustic_scale,
                                   lm_scale=args.lm_scale)
                n += 1
        log.info("scaled %d lattices", n)

    elif args.cmd == "prune":
        n = 0
        states_in = states_out = 0
        with LatticeWriter(args.output) as w:
            for key, lat in read_lattice_text_ark(args.lattices):
                pruned = lat.prune(args.beam)
                states_in += lat.num_states
                states_out += pruned.num_states
                w[key] = pruned; n += 1
        log.info("pruned %d lattices (%d -> %d states)", n, states_in,
                 states_out)

    elif args.cmd == "best-path":
        word_syms = None
        if args.words:
            word_syms = {}
            with open(args.words) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        word_syms[int(parts[1])] = parts[0]
        reader = (read_compact_lattice_text_ark if args.compact
                  else read_lattice_text_ark)
        out_f = open(args.output, "w") if args.output else sys.stdout
        for key, lat in reader(args.lattices):
            words, align, cost = lat.best_path(
                acoustic_scale=args.acoustic_scale, lm_scale=args.lm_scale)
            if word_syms is not None:
                toks = [word_syms.get(int(x), str(int(x))) for x in words]
            else:
                toks = [str(int(x)) for x in words]
            print(key, " ".join(toks), file=out_f)
        if args.output:
            out_f.close()

    elif args.cmd == "determinize":
        n = 0
        with open(args.output, "w") as f:
            for key, lat in read_lattice_text_ark(args.lattices):
                clat = determinize_lattice_pruned(lat,
                                                  det_beam=args.det_beam)
                write_compact_lattice_text(f, key, clat)
                n += 1
        log.info("determinized %d lattices", n)

    elif args.cmd == "info":
        reader = (read_compact_lattice_text_ark if args.compact
                  else read_lattice_text_ark)
        n = 0
        states = arcs = 0
        for key, lat in reader(args.lattices):
            n += 1
            states += lat.num_states
            arcs += lat.num_arcs
        print(json.dumps({"num_lattices": n, "total_states": states,
                          "total_arcs": arcs}))


if __name__ == "__main__":
    main()

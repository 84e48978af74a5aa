"""Decoding-graph toolbox — make-ctc / info.

The ctc-make-decoding-graph + ctc-graph-info CLI surface
(``ctcbin/ctc-make-decoding-graph.cc:33-56``,
``ctcbin/ctc-graph-info.cpp:1-63``): applies the CTC transform (shift
every non-epsilon ilabel +1, insert per-state blank states with blank
self-loops — ``ctc/ctc-graph.cc:30-76``) to an HCLG-style OpenFst
binary, and prints graph statistics.
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    from kaldi_ctc_tpu.utils.options import expand_config_args
    argv = expand_config_args(argv)
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("make-ctc",
                       help="HCLG.fst -> CTC.fst (shift + blank states)")
    m.add_argument("--graph", required=True, help="input VectorFst")
    m.add_argument("--output", required=True)

    i = sub.add_parser("info", help="print graph statistics")
    i.add_argument("--graph", required=True)

    return p.parse_args(argv)


def main(argv=None):
    from kaldi_ctc_tpu.decoding.wfst import NativeFst
    from kaldi_ctc_tpu.utils import get_logger

    args = parse_args(argv)
    log = get_logger("graph_tool")

    fst = NativeFst.load(args.graph)
    if args.cmd == "make-ctc":
        ctc = fst.make_ctc_graph()
        ctc.write(args.output)
        log.info("%s: %d states / %d arcs -> %s: %d states / %d arcs",
                 args.graph, fst.num_states, fst.num_arcs,
                 args.output, ctc.num_states, ctc.num_arcs)
    elif args.cmd == "info":
        print(json.dumps({
            "num_states": fst.num_states,
            "num_arcs": fst.num_arcs,
            "start": fst.start,
        }))


if __name__ == "__main__":
    main()

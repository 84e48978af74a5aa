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

    t = sub.add_parser(
        "make-tlg",
        help="lexicon + ARPA LM -> CTC decoding graph (mono): "
             "L compose G, CTC transform; the native mkgraph.sh --ctc "
             "for monophone models")
    t.add_argument("--lexicon", required=True,
                   help="'word phone1 phone2 ...' lines")
    t.add_argument("--arpa", required=True)
    t.add_argument("--output", required=True, help="TLG.fst path")
    t.add_argument("--phones", default=None,
                   help="phones.txt (symbol id) fixing phone ids to the "
                        "model's training labels; default: enumerate "
                        "from the lexicon starting at 1")
    t.add_argument("--sil-phone", default=None,
                   help="optional inter-word silence phone")
    t.add_argument("--sil-prob", type=float, default=0.5)
    t.add_argument("--write-words", default=None,
                   help="words.txt output (default <output>.words.txt)")
    t.add_argument("--write-phones", default=None,
                   help="phones.txt output (default <output>.phones.txt)")

    return p.parse_args(argv)


def main(argv=None):
    from kaldi_ctc_tpu.decoding.wfst import NativeFst
    from kaldi_ctc_tpu.utils import get_logger

    args = parse_args(argv)
    log = get_logger("graph_tool")

    if args.cmd == "make-tlg":
        from kaldi_ctc_tpu.lm import arpa_to_fst_arrays, parse_arpa
        from kaldi_ctc_tpu.lm.lexicon import (
            lexicon_to_fst_arrays, parse_lexicon)

        lexicon = parse_lexicon(args.lexicon)
        phone_to_id = None
        if args.phones:
            phone_to_id = {}
            with open(args.phones) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        phone_to_id[parts[0]] = int(parts[1])
        l_start, l_n, l_arcs, l_w, l_fin, phone_to_id, word_to_id = \
            lexicon_to_fst_arrays(lexicon, phone_to_id=phone_to_id,
                                  sil_phone=args.sil_phone,
                                  sil_prob=args.sil_prob)
        L = NativeFst.from_arrays(l_start, l_n, l_arcs, l_w, l_fin)
        lm = parse_arpa(args.arpa)
        g_start, g_n, g_arcs, g_w, g_fin, word_to_id = \
            arpa_to_fst_arrays(lm, dict(word_to_id))
        G = NativeFst.from_arrays(g_start, g_n, g_arcs, g_w, g_fin)
        LG = L.compose(G)
        # H step: self-loops (sustained frames), then the CTC transform
        tlg = LG.add_self_loops().make_ctc_graph()
        tlg.write(args.output)
        words_out = args.write_words or args.output + ".words.txt"
        with open(words_out, "w") as f:
            for w, i in sorted(word_to_id.items(), key=lambda kv: kv[1]):
                print(w, i, file=f)
        phones_out = args.write_phones or args.output + ".phones.txt"
        with open(phones_out, "w") as f:
            for ph, i in sorted(phone_to_id.items(), key=lambda kv: kv[1]):
                print(ph, i, file=f)
        log.info("L: %d/%d  G: %d/%d  LG: %d/%d  TLG: %d states / %d arcs",
                 L.num_states, L.num_arcs, G.num_states, G.num_arcs,
                 LG.num_states, LG.num_arcs, tlg.num_states, tlg.num_arcs)
        return

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

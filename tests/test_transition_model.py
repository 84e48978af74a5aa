"""TransitionModel parser tests against a hand-serialized binary blob
matching TransitionModel::Write / HmmTopology::Write exactly."""

import io
import struct

import numpy as np

from kaldi_ctc_tpu.utils.transition_model import (
    ctc_ilabel_map,
    read_transition_model,
)


def _tok(s):
    return s.encode() + b" "


def _i32(v):
    return b"\x04" + struct.pack("<i", v)


def _f32(v):
    return b"\x04" + struct.pack("<f", v)


def _ivec(vals):
    out = b"\x04" + struct.pack("<i", len(vals))
    for v in vals:
        out += struct.pack("<i", v)
    return out


def _make_mono_ctc_model(num_phones=3):
    """1-state-per-phone topology (the CTC recipe's topo): each phone has
    one emitting state with 2 transitions (self-loop + forward) and a
    final non-emitting state, like standard Kaldi topologies."""
    buf = io.BytesIO()
    buf.write(b"\x00B")
    buf.write(_tok("<TransitionModel>"))
    buf.write(_tok("<Topology>"))
    phones = list(range(1, num_phones + 1))
    buf.write(_ivec(phones))
    phone2idx = [0] * (num_phones + 1)  # all phones share entry 0
    buf.write(_ivec(phone2idx))
    buf.write(_i32(1))  # one topology entry
    buf.write(_i32(2))  # entry has 2 states
    # state 0: pdf_class 0, two transitions
    buf.write(_i32(0)); buf.write(_i32(2))
    buf.write(_i32(0)); buf.write(_f32(0.5))   # self-loop
    buf.write(_i32(1)); buf.write(_f32(0.5))   # forward
    # state 1: final, pdf_class kNoPdf (-1), no transitions
    buf.write(_i32(-1)); buf.write(_i32(0))
    buf.write(_tok("</Topology>"))
    buf.write(_tok("<Triples>"))
    buf.write(_i32(num_phones))
    for p in range(1, num_phones + 1):
        buf.write(_i32(p)); buf.write(_i32(0)); buf.write(_i32(p - 1))
    buf.write(_tok("</Triples>"))
    buf.write(_tok("<LogProbs>"))
    n_tids = num_phones * 2
    buf.write(_tok("FV"))
    buf.write(_i32(n_tids + 1))
    buf.write(np.zeros(n_tids + 1, np.float32).tobytes())
    buf.write(_tok("</LogProbs>"))
    buf.write(_tok("</TransitionModel>"))
    buf.seek(0)
    return buf


def test_parse_and_maps():
    tm = read_transition_model(_make_mono_ctc_model(3))
    assert list(tm.phones) == [1, 2, 3]
    assert tm.num_pdfs == 3
    assert tm.num_transition_ids == 6  # 3 phones x 2 transitions
    t2p = tm.tid_to_pdf()
    # tids 1,2 -> pdf 0; 3,4 -> pdf 1; 5,6 -> pdf 2
    assert list(t2p[1:]) == [0, 0, 1, 1, 2, 2]
    phones = tm.tid_to_phone()
    assert list(phones[1:]) == [1, 1, 2, 2, 3, 3]


def test_ctc_ilabel_map():
    tm = read_transition_model(_make_mono_ctc_model(2))
    m = ctc_ilabel_map(tm)
    # graph labels: 0=eps(-1), 1=blank(col 0), 2.. = tid+1 -> pdf+1
    assert m[0] == -1
    assert m[1] == 0
    # tids 1,2 (pdf 0) -> col 1; tids 3,4 (pdf 1) -> col 2
    assert list(m[2:]) == [1, 1, 2, 2]

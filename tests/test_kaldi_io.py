"""Round-trip and format tests for the Kaldi table I/O layer."""

import io

import numpy as np
import pytest

from kaldi_ctc_tpu.utils import kaldi_io as kio


def test_matrix_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mats = {f"utt{i}": rng.standard_normal((rng.integers(1, 50), 40)).astype(np.float32)
            for i in range(5)}
    ark = tmp_path / "m.ark"
    scp = tmp_path / "m.scp"
    with kio.MatrixWriter(f"ark,scp:{ark},{scp}") as w:
        for k, v in mats.items():
            w[k] = v
    got = dict(kio.SequentialMatrixReader(f"ark:{ark}"))
    assert set(got) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])
    # random access through scp offsets
    ra = kio.RandomAccessMatrixReader(f"scp:{scp}")
    np.testing.assert_array_equal(ra["utt3"], mats["utt3"])
    assert "nope" not in ra


def test_double_matrix_roundtrip(tmp_path):
    m = np.random.default_rng(1).standard_normal((7, 3)).astype(np.float64)
    p = tmp_path / "d.mat"
    kio.write_matrix(str(p), m)
    got = kio.read_matrix(str(p))
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, m)


def test_vector_roundtrip(tmp_path):
    v = np.random.default_rng(2).standard_normal(17).astype(np.float32)
    p = tmp_path / "v.vec"
    kio.write_vector(str(p), v)
    np.testing.assert_array_equal(kio.read_vector(str(p)), v)


def test_int_vector_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    alis = {f"utt{i}": rng.integers(0, 100, size=rng.integers(1, 30)).astype(np.int32)
            for i in range(4)}
    ark = tmp_path / "ali.ark"
    with kio.IntVectorWriter(f"ark:{ark}") as w:
        for k, v in alis.items():
            w[k] = v
    got = dict(kio.SequentialIntVectorReader(f"ark:{ark}"))
    for k in alis:
        np.testing.assert_array_equal(got[k], alis[k])


def test_compressed_matrix_roundtrip():
    rng = np.random.default_rng(4)
    for rows in (1, 3, 8, 200):  # <8 rows hits format 2, >=8 format 1
        m = (rng.standard_normal((rows, 13)) * 5).astype(np.float32)
        blob = kio.compress_matrix(m)
        f = io.BytesIO(blob)
        tok = kio._read_token(f)
        assert tok in ("CM", "CM2")
        got = kio._read_compressed_body(f, fmt=1 if tok == "CM" else 2)
        # compression is lossy; error bounded by quantization step
        err = np.abs(got - m).max()
        rng_width = m.max() - m.min()
        assert err < rng_width / 50.0, (rows, err)


def test_compressed_matrix_in_ark(tmp_path):
    m = np.random.default_rng(5).standard_normal((30, 40)).astype(np.float32)
    ark = tmp_path / "c.ark"
    with kio.MatrixWriter(f"ark:{ark}", compress=True) as w:
        w["u1"] = m
    (k, got), = list(kio.SequentialMatrixReader(f"ark:{ark}"))
    assert k == "u1"
    assert np.abs(got - m).max() < (m.max() - m.min()) / 50.0


def test_pipe_rspecifier(tmp_path):
    import gzip
    m = np.random.default_rng(6).standard_normal((4, 4)).astype(np.float32)
    buf = io.BytesIO()
    buf.write(b"uttX \x00B")
    kio._write_binary_matrix(buf, m)
    gz = tmp_path / "m.ark.gz"
    with gzip.open(gz, "wb") as f:
        f.write(buf.getvalue())
    got = dict(kio.SequentialMatrixReader(f"ark:gunzip -c {gz}|"))
    np.testing.assert_array_equal(got["uttX"], m)


def test_text_table(tmp_path):
    p = tmp_path / "text"
    p.write_text("utt1 HELLO WORLD\nutt2 FOO\n")
    got = dict(kio.SequentialTextReader(str(p)))
    assert got == {"utt1": "HELLO WORLD", "utt2": "FOO"}


def test_bad_specifier():
    with pytest.raises(ValueError):
        kio.SequentialMatrixReader("nocolon")
    with pytest.raises(ValueError):
        kio.SequentialMatrixReader("foo:bar")


def test_edit_distance():
    from kaldi_ctc_tpu.utils import edit_distance as ed
    assert ed.edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert ed.edit_distance([1, 2, 3], [1, 3]) == 1
    assert ed.edit_distance([], [1, 2]) == 2
    assert ed.edit_distance("kitten", "sitting") == 3
    stats = ed.edit_distance_stats(list("kitten"), list("sitting"))
    assert stats["distance"] == 3
    assert stats["ins"] + stats["del"] + stats["sub"] == 3
    d, L = ed.batch_edit_distance(
        np.array([[1, 2, 3, 0], [4, 5, 0, 0]]), np.array([3, 2]),
        np.array([[1, 3, 0], [4, 5, 6]]), np.array([2, 3]))
    assert list(d) == [1, 1]
    assert list(L) == [3, 2]


def test_text_archive_read_write_roundtrip(tmp_path):
    """ark,t: writes real text records and the readers parse them
    (regression: ',t' was ignored on write and text reads returned raw
    strings / swallowed the next record)."""
    rng = np.random.default_rng(0)
    mats = {"u1": rng.standard_normal((3, 4)).astype(np.float32),
            "u2": rng.standard_normal((2, 4)).astype(np.float32)}
    p = tmp_path / "feats.txt"
    with kio.MatrixWriter(f"ark,t:{p}") as w:
        for k, m in mats.items():
            w[k] = m
    txt = p.read_text()
    assert "[" in txt and "\x00" not in txt
    back = dict(kio.SequentialMatrixReader(f"ark,t:{p}"))
    assert set(back) == {"u1", "u2"}
    for k in mats:
        np.testing.assert_allclose(back[k], mats[k], atol=1e-5)

    # int vectors incl. the 1-char-value record that used to swallow
    # the following record
    vecs = {"a": np.array([7], np.int32),
            "b": np.array([1, 2, 3], np.int32),
            "c": np.array([], np.int32)}
    p2 = tmp_path / "ali.txt"
    with kio.IntVectorWriter(f"ark,t:{p2}") as w:
        for k, v in vecs.items():
            w[k] = v
    back = dict(kio.SequentialIntVectorReader(f"ark:{p2}"))
    assert set(back) == {"a", "b", "c"}
    for k in vecs:
        np.testing.assert_array_equal(back[k], vecs[k])


def test_kaldi_style_text_alignment_archive(tmp_path):
    """A hand-written Kaldi text alignment archive parses to int arrays."""
    p = tmp_path / "ali.txt"
    p.write_text("utt1 1 2 3\nutt2 4\nutt3 5 6\n")
    back = dict(kio.SequentialIntVectorReader(f"ark:{p}"))
    assert set(back) == {"utt1", "utt2", "utt3"}
    np.testing.assert_array_equal(back["utt2"], [4])
    np.testing.assert_array_equal(back["utt3"], [5, 6])


def test_open_random_access_and_symbols(tmp_path):
    rng = np.random.default_rng(1)
    m = rng.standard_normal((4, 2)).astype(np.float32)
    with kio.MatrixWriter(f"ark:{tmp_path}/x.ark") as w:
        w["k1"] = m
    ra = kio.open_random_access_matrices(f"ark:{tmp_path}/x.ark")
    assert "k1" in ra
    np.testing.assert_allclose(ra["k1"], m, atol=1e-6)
    (tmp_path / "words.txt").write_text("<eps> 0\nhello 1\nworld 2\n")
    syms = kio.read_symbol_table(f"{tmp_path}/words.txt")
    assert syms == {0: "<eps>", 1: "hello", 2: "world"}
    inv = kio.read_symbol_table(f"{tmp_path}/words.txt", invert=True)
    assert inv["world"] == 2


def test_background_prefetch_specifier(tmp_path):
    """'ark,bg:' decodes records on a background thread
    (util/kaldi-table.h:44-124) — same records, same order."""
    rng = np.random.default_rng(7)
    mats = {f"u{i}": rng.standard_normal((4, 3)).astype(np.float32)
            for i in range(20)}
    path = tmp_path / "m.ark"
    with kio.MatrixWriter(f"ark:{path}") as w:
        for k, v in mats.items():
            w[k] = v
    fg = list(kio.SequentialMatrixReader(f"ark:{path}"))
    bg = list(kio.SequentialMatrixReader(f"ark,bg:{path}"))
    assert [k for k, _ in bg] == [k for k, _ in fg]
    for (_, a), (_, b) in zip(fg, bg):
        np.testing.assert_array_equal(a, b)

    # abandoning the iterator must not hang (producer stops on its own)
    it = iter(kio.SequentialMatrixReader(f"ark,bg:{path}"))
    next(it)
    it.close()

    # errors on the producer thread surface to the consumer
    bad = tmp_path / "bad.ark"
    bad.write_bytes(b"u0 \x00B\xff\xff garbage")
    import pytest
    with pytest.raises(Exception):
        list(kio.SequentialMatrixReader(f"ark,bg:{bad}"))


def test_writer_to_stdout_pipe(tmp_path):
    """ark:- writers must not seek (stdout is usually a pipe)."""
    import subprocess
    import sys
    code = (
        "import numpy as np\n"
        "from kaldi_ctc_tpu.utils import kaldi_io\n"
        "with kaldi_io.MatrixWriter('ark:-') as w:\n"
        "    w['u0'] = np.ones((2, 3), np.float32)\n"
    )
    p = subprocess.run([sys.executable, "-c", code],
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    assert p.returncode == 0, p.stderr.decode()
    import io as _io
    key, mat = next(iter(
        kio._iter_ark(_io.BytesIO(p.stdout), kio._read_binary_object)))
    assert key == "u0" and mat.shape == (2, 3)


def test_text_scp_random_access_int_vectors(tmp_path):
    """ark,t,scp: int-vector archives must random-access back as int
    vectors, not mis-parsed text matrices."""
    with kio.IntVectorWriter(f"ark,t,scp:{tmp_path}/a.ark,{tmp_path}/a.scp") as w:
        w["a"] = np.asarray([1, 2], np.int32)
        w["b"] = np.asarray([3], np.int32)
    r = kio.RandomAccessIntVectorReader(f"scp:{tmp_path}/a.scp")
    np.testing.assert_array_equal(r["a"], [1, 2])
    np.testing.assert_array_equal(r["b"], [3])
    # matrices too
    with kio.MatrixWriter(f"ark,t,scp:{tmp_path}/m.ark,{tmp_path}/m.scp") as w:
        w["m"] = np.asarray([[1.5, 2.0]], np.float32)
    rm = kio.RandomAccessMatrixReader(f"scp:{tmp_path}/m.scp")
    np.testing.assert_allclose(rm["m"], [[1.5, 2.0]])


def test_background_abandon_does_not_leak_producer(tmp_path):
    """Abandoning an ark,bg: iterator stops the producer even when it
    already finished reading and is parked on the END sentinel."""
    import threading
    import time as _time
    rng = np.random.default_rng(0)
    path = tmp_path / "m.ark"
    with kio.MatrixWriter(f"ark:{path}") as w:
        for i in range(9):   # queue holds 8: END put must block first
            w[f"u{i}"] = rng.standard_normal((2, 2)).astype(np.float32)
    before = threading.active_count()
    it = iter(kio.SequentialMatrixReader(f"ark,bg:{path}"))
    next(it)
    _time.sleep(0.3)         # let the producer fill the queue and finish
    it.close()
    deadline = _time.time() + 3.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() == before


def test_empty_text_int_vector_record(tmp_path):
    """'utt1\\n' (no trailing space) parses as an empty vector and does
    not swallow the next record's key."""
    bad = tmp_path / "a.ark"
    bad.write_bytes(b"utt1\nutt2 4 5\n")
    got = dict(kio.SequentialIntVectorReader(f"ark,t:{bad}"))
    assert list(got["utt1"]) == []
    assert list(got["utt2"]) == [4, 5]

"""Compile-cache scoping: the default cache dir is per-host-type.

Round-4 judge finding: the shared default dir served XLA:CPU AOT
artifacts compiled for a different CPU feature set ("could lead to
execution errors such as SIGILL").  The fix scopes the default dir by a
fingerprint of the host's CPU flags, so a mismatched host resolves a
*different* directory instead of loading a poisoned entry.
"""

from kaldi_ctc_tpu import _host_cache_fingerprint

X86_A = """processor : 0
flags : fpu vme de pse tsc msr sse sse2 avx avx2
"""
X86_B = """processor : 0
flags : fpu vme de pse tsc msr sse sse2 avx avx2 avx512f avx512vl
"""
ARM = """processor : 0
Features : fp asimd evtstrm aes pmull sha1 sha2 crc32
"""


def test_fingerprint_differs_across_feature_sets():
    a = _host_cache_fingerprint(X86_A)
    b = _host_cache_fingerprint(X86_B)
    c = _host_cache_fingerprint(ARM)
    assert len({a, b, c}) == 3
    assert all(len(x) == 12 for x in (a, b, c))


def test_fingerprint_stable_and_order_insensitive():
    assert _host_cache_fingerprint(X86_A) == _host_cache_fingerprint(X86_A)
    shuffled = X86_A.replace("fpu vme de pse tsc msr sse sse2 avx avx2",
                             "avx2 avx sse2 sse msr tsc pse de vme fpu")
    assert _host_cache_fingerprint(shuffled) == _host_cache_fingerprint(X86_A)


def test_live_default_dir_is_scoped(monkeypatch):
    """The live process resolved a scoped dir (unless the env overrode it)."""
    import os

    import jax

    if os.environ.get("KCTPU_COMPILE_CACHE", "1") == "0":
        return
    if os.environ.get("KCTPU_COMPILE_CACHE_DIR"):
        return
    d = jax.config.jax_compilation_cache_dir
    assert d is not None
    assert os.path.basename(d) == _host_cache_fingerprint()

"""Persistent-compile-cache sanitizer (conftest) unit tests.

Round-4 hazard (VERDICT weak #6): a process killed mid-cache-write leaves
a truncated zstd entry; jax's reader decompresses the partial payload
without error (the stream just ends early) and segfaults deserializing the
truncated executable. ``tests/conftest.py:_sanitize_compile_cache`` prunes
such entries at session start; these tests pin its classification: valid
frames survive, truncated / empty / garbage files are deleted.
"""

import io

import zstandard

from tests.conftest import _sanitize_compile_cache


def _valid_entry(payload=b'x' * 200_000):
    return zstandard.ZstdCompressor().compress(payload)


def test_sanitizer_prunes_truncated_and_garbage(tmp_path):
    good = _valid_entry()
    (tmp_path / 'jit_good-cache').write_bytes(good)
    (tmp_path / 'jit_trunc-cache').write_bytes(good[: len(good) // 2])
    (tmp_path / 'jit_empty-cache').write_bytes(b'')
    (tmp_path / 'jit_garbage-cache').write_bytes(b'\x00' * 128)
    (tmp_path / 'subdir').mkdir()  # non-files must be left alone

    _sanitize_compile_cache(tmp_path)

    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ['jit_good-cache', 'subdir']


def test_sanitizer_keeps_multiframe_and_small_entries(tmp_path):
    # jax entries are single zstd frames, but concatenated frames are
    # legal zstd and must not be misclassified as truncated.
    c = zstandard.ZstdCompressor()
    multi = c.compress(b'a' * 1000) + c.compress(b'b' * 1000)
    (tmp_path / 'multi').write_bytes(multi)
    (tmp_path / 'tiny').write_bytes(c.compress(b''))

    _sanitize_compile_cache(tmp_path)

    assert sorted(p.name for p in tmp_path.iterdir()) == ['multi', 'tiny']


def test_truncated_multiframe_detected(tmp_path):
    c = zstandard.ZstdCompressor()
    multi = c.compress(b'a' * 100_000) + c.compress(b'b' * 100_000)
    (tmp_path / 'multi_trunc').write_bytes(multi[:-50])

    _sanitize_compile_cache(tmp_path)

    assert list(tmp_path.iterdir()) == []

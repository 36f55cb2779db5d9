"""Shared network plumbing: retry/backoff and atomic streaming download."""

import pytest

from tokenize_audio_tpu.net import retry_with_backoff, stream_to_file


def test_retry_eventually_succeeds():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert retry_with_backoff(flaky, "flaky", max_retries=4, base_delay=0.0) == "ok"
    assert calls["n"] == 3


def test_retry_exhaustion_raises_last_error():
    def always():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        retry_with_backoff(always, "always", max_retries=2, base_delay=0.0)


def test_fatal_errors_skip_retries():
    class NotFound(Exception):
        pass

    calls = {"n": 0}

    def missing():
        calls["n"] += 1
        raise NotFound("404")

    with pytest.raises(NotFound):
        retry_with_backoff(
            missing, "missing", max_retries=5, base_delay=0.0, fatal=(NotFound,)
        )
    assert calls["n"] == 1  # no retry burn on permanent errors


def test_stream_to_file_atomic(tmp_path):
    class Resp:
        def raise_for_status(self):
            pass

        def iter_content(self, n):
            yield b"AB"
            yield b"CD"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    dest = str(tmp_path / "sub" / "out.bin")
    assert stream_to_file(lambda: Resp(), dest) == dest
    assert open(dest, "rb").read() == b"ABCD"
    # no stray tmp files
    assert [p.name for p in (tmp_path / "sub").iterdir()] == ["out.bin"]


def test_stream_to_file_failure_leaves_no_dest(tmp_path):
    class Bad:
        def raise_for_status(self):
            raise RuntimeError("http 500")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    dest = str(tmp_path / "out.bin")
    with pytest.raises(RuntimeError):
        stream_to_file(lambda: Bad(), dest)
    import os

    assert not os.path.exists(dest)

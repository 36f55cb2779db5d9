"""HFHub contract tests against a mocked HfApi (zero-egress environment):
retry with backoff on transient failures, 409-style conflicts, exists
caching, batched single-commit uploads."""

import pytest

import tokenize_audio_tpu.hub.hf as hf_mod
from tokenize_audio_tpu.hub.hf import HFHub


class FakeApi:
    def __init__(self, fail_times=0):
        self.fail_times = fail_times
        self.calls = []
        self.files = set()

    def _maybe_fail(self, what):
        self.calls.append(what)
        if self.fail_times > 0:
            self.fail_times -= 1
            raise RuntimeError("409 conflict")

    def file_exists(self, repo_id, path, repo_type=None):
        self._maybe_fail(("exists", path))
        return path in self.files

    def upload_file(self, path_or_fileobj=None, path_in_repo=None, repo_id=None, repo_type=None):
        self._maybe_fail(("upload", path_in_repo))
        self.files.add(path_in_repo)

    def create_commit(self, repo_id=None, repo_type=None, operations=None, commit_message=None):
        self._maybe_fail(("commit", len(operations)))
        for op in operations:
            self.files.add(op.path_in_repo)

    def list_repo_files(self, repo_id, repo_type=None):
        self._maybe_fail(("list",))
        return sorted(self.files)


@pytest.fixture
def hub(monkeypatch):
    fake = FakeApi()
    monkeypatch.setattr(hf_mod, "HFHub", hf_mod.HFHub)
    h = HFHub.__new__(HFHub)
    h.repo_id = "me/test"
    h.repo_type = "dataset"
    h.api = fake
    h.max_retries = 3
    h.base_delay = 0.0  # no sleep in tests
    h._exists_cache = {}
    return h, fake


def test_upload_and_exists_cache(hub):
    h, fake = hub
    h.upload_file("/tmp/x", "data/a.json")
    assert fake.files == {"data/a.json"}
    # the first exists() after an upload REALLY asks the hub (post-upload
    # verification must not be a cached tautology); the result then caches
    n = len(fake.calls)
    assert h.exists("data/a.json") is True
    assert len(fake.calls) == n + 1
    assert h.exists("data/a.json") is True
    assert len(fake.calls) == n + 1
    # negative results ARE cached (monitor startup scans re-query mostly-
    # missing repos; the reference caches both, monitor_progress.py:89-114)
    assert h.exists("data/b.json") is False
    assert h.exists("data/b.json") is False
    assert len([c for c in fake.calls if c == ("exists", "data/b.json")]) == 1
    # an upload through this store invalidates the cached negative
    h.upload_file("/tmp/x", "data/b.json")
    assert h.exists("data/b.json") is True  # fresh query sees the upload
    # clear_exists_cache() handles external writers
    h.clear_exists_cache()
    n = len(fake.calls)
    assert h.exists("data/b.json") is True
    assert len(fake.calls) == n + 1


def test_retry_on_transient_failures(hub):
    h, fake = hub
    fake.fail_times = 2  # first two attempts fail, third succeeds
    h.upload_file("/tmp/x", "data/c.json")
    assert "data/c.json" in fake.files
    assert len([c for c in fake.calls if c == ("upload", "data/c.json")]) == 3


def test_retry_exhaustion_raises(hub):
    h, fake = hub
    fake.fail_times = 99
    with pytest.raises(RuntimeError, match="409"):
        h.upload_file("/tmp/x", "data/d.json")


def test_batch_commit(hub, monkeypatch):
    h, fake = hub

    class FakeOp:
        def __init__(self, path_in_repo=None, path_or_fileobj=None):
            self.path_in_repo = path_in_repo

    import sys
    import types

    mod = types.ModuleType("huggingface_hub")
    mod.CommitOperationAdd = FakeOp
    monkeypatch.setitem(sys.modules, "huggingface_hub", mod)
    h.upload_batch([("/tmp/1", "data/p1"), ("/tmp/2", "data/p2")])
    assert {"data/p1", "data/p2"} <= fake.files
    assert ("commit", 2) in fake.calls
    assert h.exists("data/p1") is True  # fresh post-upload verification

    assert h.list_files("data/") == sorted(fake.files)


def test_download_falls_back_to_direct_url(hub, tmp_path, monkeypatch):
    """When the hub API download path exhausts retries, the store streams
    from the resolve URL instead (prepare_pretraining_data.py:109-163)."""
    import sys
    import types

    h, fake = hub
    h.max_retries = 1

    mod = types.ModuleType("huggingface_hub")

    def bad_download(**kw):
        raise RuntimeError("api down")

    mod.hf_hub_download = bad_download
    mod.hf_hub_url = lambda repo, path, repo_type=None: f"https://x/{path}"
    monkeypatch.setitem(sys.modules, "huggingface_hub", mod)

    fetched = {}

    class FakeResp:
        status_code = 200

        def raise_for_status(self):
            pass

        def iter_content(self, n):
            yield b"PAYLOAD"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeSession:
        def get(self, url, **kw):
            fetched["url"] = url
            return FakeResp()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(type(h), "_session", lambda self: FakeSession())
    out = str(tmp_path / "out.bin")
    h.download("data/a.parquet", out)
    assert fetched["url"].endswith("data/a.parquet")
    assert open(out, "rb").read() == b"PAYLOAD"


def test_read_range_uses_range_header(hub, monkeypatch):
    import sys
    import types

    h, fake = hub
    mod = types.ModuleType("huggingface_hub")
    mod.hf_hub_url = lambda repo, path, repo_type=None: f"https://x/{path}"
    monkeypatch.setitem(sys.modules, "huggingface_hub", mod)

    seen = {}

    class FakeResp:
        content = b"abcd"
        status_code = 206

        def raise_for_status(self):
            pass

    class FakeSession:
        def get(self, url, headers=None, **kw):
            seen["range"] = headers["Range"]
            return FakeResp()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(type(h), "_session", lambda self: FakeSession())
    assert h.read_range("data/a.parquet", 100, 4) == b"abcd"
    assert seen["range"] == "bytes=100-103"

    # a server that ignores Range (200 + full body) still yields the window
    class FullResp(FakeResp):
        status_code = 200
        content = bytes(range(200))

    FakeSession.get = lambda self, url, headers=None, **kw: FullResp()
    assert h.read_range("data/a.parquet", 10, 4) == bytes([10, 11, 12, 13])

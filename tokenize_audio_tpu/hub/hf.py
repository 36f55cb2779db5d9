"""HuggingFace Hub artifact store with the reference's resilience contracts:

  - exponential backoff with jitter on 409 commit conflicts and transient
    errors (common-voice-mimi/process_common_voice.py:40-79);
  - N files in ONE commit via CommitOperationAdd/create_commit to dodge
    rate limits (yodas2-mimi/process_shard.py:126-182);
  - exists via HfApi.file_exists with per-path result cache
    (yodas2-mimi/monitor_progress.py:89-114).

Network use is inherently environment-gated; everything here lazy-imports
huggingface_hub so air-gapped deployments never touch it.
"""

from __future__ import annotations

import logging
import random
import time
from typing import List, Sequence, Tuple

from tokenize_audio_tpu.hub.base import ArtifactStore

logger = logging.getLogger(__name__)


class HFHub(ArtifactStore):
    def __init__(
        self,
        repo_id: str,
        repo_type: str = "dataset",
        token: str | None = None,
        max_retries: int = 5,
        base_delay: float = 2.0,
    ):
        from huggingface_hub import HfApi

        self.repo_id = repo_id
        self.repo_type = repo_type
        self.api = HfApi(token=token)
        self.max_retries = max_retries
        self.base_delay = base_delay
        self._exists_cache: dict[str, bool] = {}

    def _retry(self, fn, what: str):
        for attempt in range(self.max_retries):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — HF raises many types; retry all transient
                if attempt == self.max_retries - 1:
                    raise
                delay = self.base_delay * (2**attempt) + random.uniform(0, 1)
                logger.warning(
                    "%s failed (%s: %s); retry %d/%d in %.1fs",
                    what,
                    type(e).__name__,
                    e,
                    attempt + 1,
                    self.max_retries,
                    delay,
                )
                time.sleep(delay)

    def exists(self, path: str) -> bool:
        if path in self._exists_cache and self._exists_cache[path]:
            return True
        result = bool(
            self._retry(
                lambda: self.api.file_exists(
                    self.repo_id, path, repo_type=self.repo_type
                ),
                f"file_exists({path})",
            )
        )
        self._exists_cache[path] = result
        return result

    def upload_file(self, local_path: str, repo_path: str) -> None:
        self._retry(
            lambda: self.api.upload_file(
                path_or_fileobj=local_path,
                path_in_repo=repo_path,
                repo_id=self.repo_id,
                repo_type=self.repo_type,
            ),
            f"upload_file({repo_path})",
        )
        self._exists_cache[repo_path] = True

    def upload_batch(self, items: Sequence[Tuple[str, str]]) -> None:
        from huggingface_hub import CommitOperationAdd

        ops = [
            CommitOperationAdd(path_in_repo=rp, path_or_fileobj=lp)
            for lp, rp in items
        ]

        def commit():
            self.api.create_commit(
                repo_id=self.repo_id,
                repo_type=self.repo_type,
                operations=ops,
                commit_message=f"Batch upload of {len(ops)} files",
            )

        self._retry(commit, f"create_commit({len(ops)} files)")
        for _, rp in items:
            self._exists_cache[rp] = True

    def list_files(self, prefix: str = "") -> List[str]:
        files = self._retry(
            lambda: self.api.list_repo_files(self.repo_id, repo_type=self.repo_type),
            "list_repo_files",
        )
        return sorted(f for f in files if f.startswith(prefix))

    def download(self, repo_path: str, local_path: str) -> str:
        import os
        import shutil

        from huggingface_hub import hf_hub_download

        got = self._retry(
            lambda: hf_hub_download(
                repo_id=self.repo_id, filename=repo_path, repo_type=self.repo_type
            ),
            f"download({repo_path})",
        )
        os.makedirs(os.path.dirname(os.path.abspath(local_path)), exist_ok=True)
        shutil.copyfile(got, local_path)
        return local_path

"""Crash-safe progress bookkeeping.

Mirrors the reference's contracts (SURVEY §5 checkpoint/resume):
  - progress JSON {completed, failed, timestamps} saved after every work
    unit (yodas2-mimi/process_shard.py:917-931);
  - atomic tmp+rename writes with PID-suffixed temp names
    (pretraining-data/prepare_pretraining_data.py:616-635);
  - restart-anywhere: loading tolerates a missing or torn file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List


def atomic_write_json(path: str, obj: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_json(path: str, default: Any = None) -> Any:
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return default


class ShardProgress:
    """Per-shard progress ledger: completed / failed work-unit ids."""

    def __init__(self, progress_dir: str, shard_id: str):
        self.path = os.path.join(progress_dir, f"{shard_id}_progress.json")
        self.shard_id = shard_id
        state = read_json(self.path, {}) or {}
        self.completed: List[str] = list(state.get("completed", []))
        self.failed: List[str] = list(state.get("failed", []))
        self.meta: Dict[str, Any] = state.get("meta", {})

    def is_completed(self, unit_id: str) -> bool:
        return unit_id in self.completed

    def mark_completed(self, unit_id: str) -> None:
        if unit_id not in self.completed:
            self.completed.append(unit_id)
        if unit_id in self.failed:
            self.failed.remove(unit_id)
        self.save()

    def mark_failed(self, unit_id: str) -> None:
        if unit_id not in self.failed and unit_id not in self.completed:
            self.failed.append(unit_id)
        self.save()

    def save(self) -> None:
        atomic_write_json(
            self.path,
            {
                "shard_id": self.shard_id,
                "completed": self.completed,
                "failed": self.failed,
                "meta": self.meta,
                "updated_at": time.time(),
            },
        )

"""Dataset row counting from parquet metadata only.

Capability equivalent of ``pretraining-data/count_dataset_rows.py``: read
each parquet file's footer metadata (num_rows) without materializing data
(:66-88), aggregate per prefix, and emit a markdown stats table
(:147-208).
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from typing import Dict


def count_parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def count_hub_dataset(hub, prefix: str = "", group_depth: int = 1) -> Dict[str, Dict]:
    """Count rows of every parquet under prefix, grouped by the first
    ``group_depth`` path components."""
    import os
    import tempfile

    groups: Dict[str, Dict] = defaultdict(lambda: {"files": 0, "rows": 0})
    for f in hub.list_files(prefix):
        if not f.endswith(".parquet"):
            continue
        parts = f.split("/")
        key = "/".join(parts[:group_depth]) if group_depth else "all"
        with tempfile.TemporaryDirectory() as td:
            local = os.path.join(td, "x.parquet")
            hub.download(f, local)
            rows = count_parquet_rows(local)
        groups[key]["files"] += 1
        groups[key]["rows"] += rows
    return dict(groups)


def stats_markdown(groups: Dict[str, Dict]) -> str:
    lines = ["| group | files | rows |", "|---|---:|---:|"]
    total_f = total_r = 0
    for key in sorted(groups):
        g = groups[key]
        lines.append(f"| {key} | {g['files']} | {g['rows']:,} |")
        total_f += g["files"]
        total_r += g["rows"]
    lines.append(f"| **total** | {total_f} | {total_r:,} |")
    return "\n".join(lines)


def main(argv=None):
    from tokenize_audio_tpu.hub import open_hub

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hub", required=True)
    ap.add_argument("--prefix", default="")
    ap.add_argument("--group-depth", type=int, default=1)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args(argv)
    groups = count_hub_dataset(open_hub(args.hub), args.prefix, args.group_depth)
    if args.markdown:
        print(stats_markdown(groups))
    else:
        print(json.dumps(groups, indent=1))


if __name__ == "__main__":
    main()

"""Parquet streaming base + path utilities.

Behavioral spec: reference data/interleave_datasets/interleave_dataset.py:7-224
(ParquetStandardIterableDataset: row-group-sharded iteration with
[parquet_idx, row_group_id, row_idx] resume) and data/parquet_utils.py:15-84
(path expansion with repeat-to-count; the HDFS arm is replaced by local FS —
pyarrow's fs abstraction covers remote stores when configured)."""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional, Tuple

from .distributed import DistributedIterable


def get_parquet_data_paths(
    dirs: List[str], repeats: Optional[List[int]] = None
) -> List[Tuple[str, int]]:
    """Expand parquet directories to (file, repeat_count)-weighted file lists
    (reference parquet_utils.py:15-56)."""
    out = []
    repeats = repeats or [1] * len(dirs)
    for d, rep in zip(dirs, repeats):
        files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
        for _ in range(max(int(rep), 1)):
            out.extend(files)
    return out


class ParquetIterable(DistributedIterable):
    """Iterates rows of sharded parquet files with row-group granularity and
    resume support. Subclasses implement parse_row(row_dict) -> sample|None."""

    def __init__(
        self,
        dataset_name: str,
        parquet_files: List[str],
        rows_per_shard_hint: int = 0,
        **dist_kwargs,
    ):
        super().__init__(dataset_name, **dist_kwargs)
        self.data_paths = [(f, i) for i, f in enumerate(parquet_files)]
        self.set_epoch()

    def parse_row(self, row: dict):
        raise NotImplementedError

    def __iter__(self) -> Iterator:
        import pyarrow.parquet as pq

        files, worker_id = self.get_data_paths_per_worker()
        cursor = self.status_for_worker(worker_id)
        if cursor is not None:
            start_file, start_rg, start_row = cursor
            start_row += 1  # resume AFTER the last consumed row
        else:
            start_file = start_rg = start_row = 0
        while True:
            for fi, (path, _) in enumerate(files):
                if fi < start_file:
                    continue
                pf = pq.ParquetFile(path)
                for rg in range(pf.num_row_groups):
                    if fi == start_file and rg < start_rg:
                        continue
                    table = pf.read_row_group(rg)
                    rows = table.to_pylist()
                    row0 = start_row if (fi == start_file and rg == start_rg) else 0
                    for ri, row in enumerate(rows):
                        if ri < row0:
                            continue
                        try:
                            sample = self.parse_row(row)
                        except Exception:
                            continue
                        if sample is None:
                            continue
                        sample["data_indexes"] = {
                            "data_indexes": [fi, rg, ri],
                            "worker_id": worker_id,
                            "dataset_name": self.dataset_name,
                        }
                        yield sample
            start_file = start_rg = start_row = 0

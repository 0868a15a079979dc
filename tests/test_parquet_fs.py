"""Remote-filesystem parquet ingestion: fs:// URI listing + reading through
pyarrow filesystems (reference data/parquet_utils.py:15-84 generalized), the
register_fs_factory cluster hook, and the cross-host path merge."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from g2vlm_tpu.data.parquet_dataset import (
    ParquetIterable,
    get_parquet_data_paths,
    merge_paths_across_hosts,
    open_parquet,
    register_fs_factory,
    resolve_fs,
)


@pytest.fixture
def parquet_tree(tmp_path):
    root = tmp_path / "store"
    (root / "sub").mkdir(parents=True)
    for i, rel in enumerate(["a.parquet", "sub/b.parquet"]):
        rows = [{"val": i * 10 + j} for j in range(4)]
        pq.write_table(
            pa.Table.from_pylist(rows), str(root / rel), row_group_size=2
        )
    (root / "notes.txt").write_text("ignored")
    return root


def test_resolve_fs_plain_path(tmp_path):
    fs, p = resolve_fs(str(tmp_path))
    assert fs is None and p == str(tmp_path)


def test_file_uri_listing_and_read(parquet_tree):
    uri = f"file://{parquet_tree}"
    paths = get_parquet_data_paths([uri])
    assert len(paths) == 2
    assert all(p.startswith("file://") and p.endswith(".parquet") for p in paths)
    pf = open_parquet(paths[0])
    assert pf.metadata.num_rows == 4


def test_custom_fs_factory(parquet_tree):
    import pyarrow.fs as pafs

    def mock_factory(uri):
        # petrel-style cluster hook: scheme-specific fs construction
        assert uri.startswith("mock://")
        return pafs.SubTreeFileSystem(
            str(parquet_tree), pafs.LocalFileSystem()
        ), uri[len("mock://") :]

    register_fs_factory("mock", mock_factory)
    paths = get_parquet_data_paths(["mock://"], repeats=[2])
    assert len(paths) == 4  # 2 files x repeat 2
    assert all(p.startswith("mock://") for p in paths)
    pf = open_parquet(paths[0])
    assert pf.metadata.num_rows == 4


class _RawRows(ParquetIterable):
    def parse_row(self, row):
        return dict(row)


def test_iterate_through_uri(parquet_tree):
    uri = f"file://{parquet_tree}"
    files = get_parquet_data_paths([uri])
    ds = _RawRows("mockset", files)
    it = iter(ds)
    vals = [next(it)["val"] for _ in range(8)]
    assert sorted(vals) == sorted([0, 1, 2, 3, 10, 11, 12, 13])
    # resume cursor metadata carries (file, row_group, row) indexes
    sample = next(iter(_RawRows("mockset", files)))
    assert sample["data_indexes"]["data_indexes"] == [0, 0, 0]


def test_rank_sharded_listing_single_host(parquet_tree, tmp_path):
    # two dirs, world_size=2: each rank lists one chunk; on one JAX process
    # the merge is identity, so rank 0 sees only its own chunk's files
    other = tmp_path / "other"
    other.mkdir()
    pq.write_table(
        pa.Table.from_pylist([{"val": 99}]), str(other / "c.parquet")
    )
    dirs = [f"file://{parquet_tree}", f"file://{other}"]
    r0 = get_parquet_data_paths(dirs, rank=0, world_size=2)
    r1 = get_parquet_data_paths(dirs, rank=1, world_size=2)
    assert len(r0) == 2 and len(r1) == 1
    assert sorted(r0 + r1) == sorted(get_parquet_data_paths(dirs))


def test_merge_paths_single_process_identity():
    paths = ["a.parquet", "b.parquet"]
    assert merge_paths_across_hosts(paths) == paths

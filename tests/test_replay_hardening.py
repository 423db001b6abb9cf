"""r18 hardening of the chunked-replay scratch cache (the four r17
ADVICE lows): content-validated chunk-set reuse, tolerance for
repartitionByRange emitting fewer non-empty partitions, a private
0o700 per-user cache root, part-file-fingerprint row-count caching,
and the registration's guaranteed >=2-chunk path.
"""

import json
import os
import stat

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dpu_olap_spark.sources.tables import parquet_row_count
from dpu_olap_spark.streaming.replay import (
    _chunk_set_ok,
    _scratch_root,
    _stable_scratch,
    ordered_event_chunks,
)

SF = "/root/testdata/sf0.001"
EVENTS = os.path.join(SF, "events.parquet")


def test_chunk_set_reuse_is_content_validated(spark, tmp_path):
    """A cached chunk set is reused only when the manifest AND the
    parquet footers (row-count sum, event-time ordering) check out;
    a planted or truncated set fails closed and is rebuilt."""
    scratch = str(tmp_path)
    dst = ordered_event_chunks(spark, EVENTS, scratch, 4)
    n = parquet_row_count(EVENTS)
    assert _chunk_set_ok(dst, 4, n)
    # wrong request or wrong source volume -> no reuse
    assert not _chunk_set_ok(dst, 3, n)
    assert not _chunk_set_ok(dst, 4, n + 1)

    # planted extra file (file count no longer matches the manifest)
    extra = os.path.join(dst, "chunk_9999.parquet")
    chunks = sorted(
        f for f in os.listdir(dst) if f.startswith("chunk_")
    )
    import shutil

    shutil.copy(os.path.join(dst, chunks[0]), extra)
    assert not _chunk_set_ok(dst, 4, n)
    os.remove(extra)
    assert _chunk_set_ok(dst, 4, n)

    # truncated chunk (row counts no longer sum to the source):
    # manifest edited to keep n_files consistent so ONLY the footer
    # row-count check can catch it
    victim = os.path.join(dst, chunks[-1])
    os.remove(victim)
    man_path = os.path.join(dst, "_MANIFEST.json")
    man = json.load(open(man_path))
    man["n_files"] -= 1
    json.dump(man, open(man_path, "w"))
    assert not _chunk_set_ok(dst, 4, n)

    # no manifest at all -> never reused (pre-r18 cache dirs)
    os.remove(man_path)
    assert not _chunk_set_ok(dst, 4, n)

    # a rebuild recovers the full set
    dst2 = ordered_event_chunks(spark, EVENTS, scratch, 4)
    assert dst2 == dst
    assert _chunk_set_ok(dst, 4, n)


def test_collapsed_range_partitions_accepted(spark, tmp_path):
    """repartitionByRange can legitimately emit fewer non-empty
    partitions than requested (here: every row shares one ts, so one
    range bucket holds everything).  That must NOT hard-fail — the
    ordering guarantee is intact with fewer chunks (r17 ADVICE)."""
    src = str(tmp_path / "flat.parquet")
    import datetime

    t = datetime.datetime(2024, 1, 1)
    pq.write_table(
        pa.table({"ts": [t] * 50, "user_id": list(range(50))}), src
    )
    dst = ordered_event_chunks(spark, src, str(tmp_path / "s"), 3)
    files = sorted(
        f for f in os.listdir(dst) if f.startswith("chunk_")
    )
    assert 1 <= len(files) <= 3
    man = json.load(open(os.path.join(dst, "_MANIFEST.json")))
    assert man["n_files"] == len(files)
    assert man["total_rows"] == 50
    assert _chunk_set_ok(dst, 3, 50)


def test_scratch_root_is_private_and_bounded():
    """The reusable cache root is uid-scoped, 0o700, and owned by us;
    _stable_scratch prunes it to the newest _SCRATCH_KEEP histories."""
    root = _scratch_root()
    st = os.stat(root, follow_symlinks=False)
    assert stat.S_ISDIR(st.st_mode)
    assert st.st_uid == os.getuid()
    assert not (st.st_mode & 0o077), oct(st.st_mode)
    d = _stable_scratch(EVENTS, parquet_row_count(EVENTS))
    assert os.path.dirname(d) == root
    assert os.path.isdir(d)


def test_scratch_prune_keeps_newest(tmp_path, monkeypatch):
    """Oldest-mtime per-history dirs beyond the keep bound are
    evicted; the dir in use is always kept."""
    import dpu_olap_spark.streaming.replay as replay

    root = str(tmp_path / "root")
    os.makedirs(root, mode=0o700)
    monkeypatch.setattr(replay, "_scratch_root", lambda: root)
    monkeypatch.setattr(replay, "_SCRATCH_KEEP", 2)
    import time

    for i in range(4):
        d = os.path.join(root, f"hold{i}")
        os.makedirs(d)
        os.utime(d, (1_000_000 + i, 1_000_000 + i))
    keep = replay._stable_scratch(EVENTS, parquet_row_count(EVENTS))
    left = set(os.listdir(root))
    assert os.path.basename(keep) in left
    # newest 2 of the 4 pre-seeded dirs survive, oldest 2 evicted
    assert "hold3" in left and "hold2" in left
    assert "hold0" not in left and "hold1" not in left


def test_row_count_cache_sees_inplace_part_overwrite(tmp_path):
    """parquet_row_count keyed on per-part-file fingerprints: an
    in-place overwrite of a part inside a directory (directory mtime
    unchanged) must refresh the count (r17 ADVICE)."""
    d = tmp_path / "tbl"
    d.mkdir()
    p = str(d / "part-0.parquet")
    pq.write_table(pa.table({"x": list(range(10))}), p)
    assert parquet_row_count(str(d)) == 10
    dir_mtime = os.path.getmtime(str(d))
    pq.write_table(pa.table({"x": list(range(25))}), p)
    os.utime(str(d), (dir_mtime, dir_mtime))  # pin the directory mtime
    assert parquet_row_count(str(d)) == 25


def test_registration_refuses_single_batch_degrade(spark, tmp_path, monkeypatch):
    """q_stream_replay_chunked exists to driver-check the CHUNKED
    path; pointed at a fixture too small to chunk it must fail loudly
    rather than silently run the single-batch path (r17 ADVICE)."""
    import datetime

    tiny_dir = tmp_path / "sf_tiny"
    tiny_dir.mkdir()
    t0 = datetime.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": list(range(100)),
                "ts": [t0 + datetime.timedelta(seconds=i) for i in range(100)],
                "user_id": [i % 5 for i in range(100)],
                "event_type": ["click"] * 100,
                "value": [1.0] * 100,
                "props": ["{}"] * 100,
            }
        ),
        str(tiny_dir / "events.parquet"),
    )
    from dpu_olap_spark.registry import get_query

    with pytest.raises(AssertionError, match="too small"):
        get_query("stream_replay_chunked").build(spark, str(tiny_dir))

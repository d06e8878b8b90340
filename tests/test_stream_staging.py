"""stamp_staged_files: deterministic mtime ordering for staged stream files.

The file stream source replays files in modification-time order; the
staging loops used to guarantee that order with ~1 s wall-clock sleeps
between appends. The stamp helper must give the same strict ordering
without sleeping: every file appended after the `before` snapshot gets an
mtime strictly greater than every pre-existing file's, and successive
stamping rounds stay strictly ordered.
"""

import os

from rabitq_spark.streaming.pipeline import stamp_staged_files


def _write(d, name, data=b"x"):
    p = os.path.join(d, name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def _mtime(d, name):
    return os.stat(os.path.join(d, name)).st_mtime


def test_new_files_stamped_strictly_after_existing(tmp_path):
    d = str(tmp_path)
    _write(d, "a.parquet")
    _write(d, "b.parquet")
    before = set(os.listdir(d))
    _write(d, "c.parquet")
    _write(d, "d.parquet")
    stamp_staged_files(d, before)
    prev = max(_mtime(d, f) for f in before)
    assert _mtime(d, "c.parquet") > prev
    assert _mtime(d, "d.parquet") > prev
    # same stamp within a wave (one micro-batch), not merely >=
    assert _mtime(d, "c.parquet") == _mtime(d, "d.parquet")


def test_existing_files_untouched(tmp_path):
    d = str(tmp_path)
    _write(d, "a.parquet")
    t0 = _mtime(d, "a.parquet")
    before = set(os.listdir(d))
    _write(d, "b.parquet")
    stamp_staged_files(d, before)
    assert _mtime(d, "a.parquet") == t0


def test_successive_waves_strictly_ordered(tmp_path):
    d = str(tmp_path)
    stamps = []
    seen = set()
    for wave in range(4):
        seen = set(os.listdir(d)) if wave else set()
        _write(d, f"slice_{wave}.parquet")
        stamp_staged_files(d, seen)
        stamps.append(_mtime(d, f"slice_{wave}.parquet"))
    assert stamps == sorted(stamps)
    # strict: the source's ordering granularity is ~1 ms, stamps step >= 2 s
    assert all(b - a >= 1.0 for a, b in zip(stamps, stamps[1:]))


def test_empty_before_snapshot(tmp_path):
    d = str(tmp_path)
    _write(d, "first.parquet")
    stamp_staged_files(d, set())
    # stamped into the future relative to "now" — strictly orderable by
    # any later wave that snapshots this file
    import time

    assert _mtime(d, "first.parquet") > time.time()

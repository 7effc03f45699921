"""reap_stale_siblings: pre-boot scratch dirs are reclaimed, anything
touched since boot (= possibly a live sibling process) is kept."""

from __future__ import annotations

import os

from clickhousebackup_spark.scratch import reap_stale_siblings


def test_reaps_only_pre_boot_dirs(tmp_path):
    prefix = str(tmp_path / "cbs_test_reap_")
    old = tmp_path / "cbs_test_reap_old"
    new = tmp_path / "cbs_test_reap_new"
    other = tmp_path / "unrelated_dir"
    for d in (old, new, other):
        d.mkdir()
        (d / "payload").write_text("x")
    os.utime(old, (1_000_000, 1_000_000))  # 1970 — long before any boot
    os.utime(other, (1_000_000, 1_000_000))

    removed = reap_stale_siblings(prefix)

    assert str(old) in removed
    assert not old.exists()
    assert new.exists()  # post-boot mtime: possibly live, kept
    assert other.exists()  # prefix mismatch: never touched


def test_missing_base_dir_is_noop(tmp_path):
    assert reap_stale_siblings(str(tmp_path / "nope" / "cbs_x_")) == []

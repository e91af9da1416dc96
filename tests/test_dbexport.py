"""Export-runner tests: shipping, failure quarantine, retry — the
durability loop of monit-objects-fwm.c:725-752 / xe-dbexport-pg.sh."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from xe_dbexport import pending_files, run_export  # noqa: E402


def _write(d, name, text="INSERT INTO t VALUES (1);"):
    p = d / name
    p.write_text(text)
    return str(p)


def test_pg_ship_all_in_one_txn(tmp_path):
    _write(tmp_path, "a_1.sql")
    _write(tmp_path, "a_2.sql")
    sink = tmp_path / "sink.txt"
    shipped, failed = run_export(str(tmp_path), f"cat >> {sink}", "pg")
    assert (shipped, failed) == (2, 0)
    got = sink.read_text()
    assert got.startswith("BEGIN;") and got.rstrip().endswith("COMMIT;")
    assert pending_files(str(tmp_path)) == []


def test_pg_failure_quarantines_and_retries(tmp_path):
    _write(tmp_path, "w_1.sql")
    shipped, failed = run_export(str(tmp_path), "false", "pg")
    assert (shipped, failed) == (0, 1)
    failed_dir = tmp_path / "expfailed"
    assert [f.name for f in failed_dir.iterdir()] == ["w_1.sql"]
    # engine keeps producing while DB is down; next run retries both
    _write(tmp_path, "w_2.sql")
    shipped, failed = run_export(str(tmp_path), "cat > /dev/null", "pg",
                                 retry_failed=True)
    assert (shipped, failed) == (2, 0)
    assert list(failed_dir.iterdir()) == []


def test_clickhouse_per_file(tmp_path):
    _write(tmp_path, "a.sql")
    bad = _write(tmp_path, "b.sql", "BOOM")
    cmd = "grep -q INSERT"
    shipped, failed = run_export(str(tmp_path), cmd, "clickhouse")
    assert (shipped, failed) == (1, 1)
    assert [f.name for f in (tmp_path / "expfailed").iterdir()] == ["b.sql"]
    assert not os.path.exists(bad)

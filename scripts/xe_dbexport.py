"""SQL-file export runner — parity with the reference's db-export scripts
(`scripts/xe-dbexport-pg.sh`, spawned double-forked from
monit-objects-fwm.c:725-752, durability rationale INTERNALS.md:46).

Ships every pending ``*.sql`` file under EXP_DIR to a DB shell command:
- pg: all files concatenated inside one BEGIN/COMMIT fed to stdin, so a
  window's tables land atomically and re-running is safe.
- clickhouse: one invocation per file (no multi-statement transactions).
Successes are deleted; failures move to ``EXP_DIR/expfailed/`` and are
retried on the next run with ``--retry-failed`` — the engine keeps
producing files while the DB is down, exactly like the reference.

Usage:
    python scripts/xe_dbexport.py EXP_DIR \
        --cmd "psql -v ON_ERROR_STOP=1 -d flows" \
        [--db-type pg|clickhouse] [--retry-failed]

NB: psql WITHOUT ``-v ON_ERROR_STOP=1`` exits 0 even when the
transaction aborted — the runner would then unlink files believing they
shipped. The runner warns when it spots a bare psql command.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys


def pending_files(exp_dir: str, retry_failed: bool = False) -> list[str]:
    out = sorted(
        os.path.join(exp_dir, f)
        for f in os.listdir(exp_dir)
        if f.endswith(".sql") and os.path.isfile(os.path.join(exp_dir, f))
    )
    failed_dir = os.path.join(exp_dir, "expfailed")
    if retry_failed and os.path.isdir(failed_dir):
        out = sorted(
            os.path.join(failed_dir, f)
            for f in os.listdir(failed_dir)
            if f.endswith(".sql")
        ) + out
    return out


def _fail(exp_dir: str, paths: list[str]) -> None:
    failed_dir = os.path.join(exp_dir, "expfailed")
    os.makedirs(failed_dir, exist_ok=True)
    for p in paths:
        if os.path.dirname(p) != failed_dir:
            shutil.move(p, os.path.join(failed_dir, os.path.basename(p)))


def run_export(
    exp_dir: str,
    cmd: str,
    db_type: str = "pg",
    retry_failed: bool = False,
) -> tuple[int, int]:
    """Returns (n_shipped, n_failed)."""
    files = pending_files(exp_dir, retry_failed)
    if not files:
        return 0, 0
    if db_type == "pg":
        def ship(batch: list[str]) -> bool:
            payload = "BEGIN;\n"
            for p in batch:
                with open(p) as fh:
                    payload += fh.read() + "\n"
            payload += "COMMIT;\n"
            proc = subprocess.run(
                cmd, shell=True, input=payload.encode(),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return proc.returncode == 0

        # fast path: the whole run in ONE transaction (a window's tables
        # land atomically). On failure fall back to per-file txns so a
        # single poisoned file quarantines ALONE instead of dragging
        # every later window's files into expfailed forever
        # (head-of-line blocking).
        if ship(files):
            for p in files:
                os.unlink(p)
            return len(files), 0
        shipped = failed = 0
        for p in files:
            if ship([p]):
                os.unlink(p)
                shipped += 1
            else:
                _fail(exp_dir, [p])
                failed += 1
        return shipped, failed
    # clickhouse: per-file shipping
    shipped = failed = 0
    for p in files:
        with open(p, "rb") as fh:
            proc = subprocess.run(
                cmd, shell=True, stdin=fh,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        if proc.returncode == 0:
            os.unlink(p)
            shipped += 1
        else:
            _fail(exp_dir, [p])
            failed += 1
    return shipped, failed


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    exp_dir = argv[1]
    cmd = None
    db_type = "pg"
    retry = "--retry-failed" in argv
    for i, a in enumerate(argv):
        if a == "--cmd" and i + 1 < len(argv):
            cmd = argv[i + 1]
        if a == "--db-type" and i + 1 < len(argv):
            db_type = argv[i + 1]
    if cmd is None:
        print("--cmd required", file=sys.stderr)
        return 2
    if db_type == "pg" and "psql" in cmd and "ON_ERROR_STOP" not in cmd:
        print(
            "warning: psql without -v ON_ERROR_STOP=1 exits 0 on an "
            "aborted transaction — files would be deleted unshipped",
            file=sys.stderr,
        )
    shipped, failed = run_export(exp_dir, cmd, db_type, retry)
    print(f"shipped={shipped} failed={failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))

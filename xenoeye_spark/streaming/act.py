"""Alert actions — notification files, action scripts, mavg dumps, and
extended-stats activation.

Reference behaviors reproduced (monit-objects-mavg-act.c, SURVEY.md §2.2):
- per (key, limit) notification file created on NEW, refreshed while the
  alert is active, deleted on back-to-norm (act.c:230-302,324-327)
- action / back2norm scripts exec'd with
  argv = [mo, mavg, limit-name, notif-file, key..., value, threshold]
  (act.c:120-189, STEP-BY-STEP.md:938-947)
- ``ext`` flags: alerts activate dormant extended fwm windows, including
  cross-object ones (monit-objects-mavg.c:1033-1127)
- mavg dump files: human-readable current rates (monit-objects-mavg-dump.c)

Spark shape: a ``foreachBatch`` sink over the mavg_alert_stream output.
Alert volume is tiny (keys over limit), so driver-side file/exec I/O is
not a scale concern; the heavy stateful work stays distributed.
"""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import DataFrame


class ExtGate:
    """Activation flags for ``extended: true`` windows (dormant until a
    threshold trips, monit-objects.h:74-95). File-backed so every component
    (and a restart) sees the same state; one flag file per ext name."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.state_dir, name.replace("/", "__") + ".active")

    def activate(self, name: str) -> None:
        open(self._path(name), "w").close()

    def deactivate(self, name: str) -> None:
        try:
            os.unlink(self._path(name))
        except FileNotFoundError:
            pass

    def is_active(self, name: str) -> bool:
        return os.path.exists(self._path(name))


class AlertActionSink:
    """foreachBatch consumer for mavg_alert_stream output rows
    (keys..., event, rate, threshold, ts_ns)."""

    def __init__(
        self,
        mo_name: str,
        mavg_name: str,
        limit_name: str,
        key_cols: list[str],
        notif_dir: str,
        action_script: str | None = None,
        back2norm_script: str | None = None,
        ext: list[str] | None = None,
        ext_gate: ExtGate | None = None,
        run_scripts: bool = True,
    ):
        self.mo = mo_name
        self.mavg = mavg_name
        self.limit = limit_name
        self.key_cols = key_cols
        self.notif_dir = notif_dir
        self.action_script = action_script
        self.back2norm_script = back2norm_script
        self.ext = ext or []
        self.gate = ext_gate
        self.run_scripts = run_scripts
        os.makedirs(notif_dir, exist_ok=True)

    def _notif_path(self, key_vals: list) -> str:
        # key values can be WIRE-DERIVED strings (dns_name, sni): any
        # path metacharacter must not escape notif_dir — an attacker
        # sending dns_name '../../...' would otherwise choose where the
        # daemon creates (NEW) and deletes (GONE) files
        import re

        key_part = "-".join(
            re.sub(r"[^A-Za-z0-9._:-]", "_", str(v)).strip(".")
            for v in key_vals
        )
        return os.path.join(
            self.notif_dir, f"{self.mo}-{self.mavg}-{self.limit}-{key_part}"
        )

    def _exec(self, script: str, path: str, key_vals: list, rate, thr) -> None:
        if not self.run_scripts:
            return
        argv = [script, self.mo, self.mavg, self.limit, path,
                *[str(v) for v in key_vals], str(rate), str(thr)]
        try:
            subprocess.Popen(argv, start_new_session=True)
        except OSError:
            pass  # missing script: alert file remains the signal

    def process_batch(self, df: DataFrame, epoch_id: int) -> None:
        for row in df.collect():
            key_vals = [row[k] for k in self.key_cols]
            path = self._notif_path(key_vals)
            event = row["event"]
            if event in ("NEW", "UPDATE"):
                with open(path, "w") as fh:
                    fh.write(
                        f"{self.mo} {self.mavg} {self.limit} "
                        f"{' '.join(str(v) for v in key_vals)} "
                        f"{row['rate']} {row['threshold']}\n"
                    )
                if event == "NEW":
                    if self.action_script:
                        self._exec(self.action_script, path, key_vals,
                                   row["rate"], row["threshold"])
                    if self.gate:
                        for name in self.ext:
                            self.gate.activate(name)
            elif event == "GONE":
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
                if self.back2norm_script:
                    self._exec(self.back2norm_script, path, key_vals,
                               row["rate"], row["threshold"])
                if self.gate:
                    for name in self.ext:
                        self.gate.deactivate(name)


def write_mavg_dump(
    rates: DataFrame,
    dump_path: str,
    key_cols: list[str],
    mo_name: str = "",
    mavg_name: str = "",
) -> None:
    """Human-readable current moving-average rates
    (monit-objects-mavg-dump.c:34-255 shape: one 'key... rate' line)."""
    rows = rates.collect()
    with open(dump_path, "w") as fh:
        fh.write(f"# {mo_name}/{mavg_name} moving averages\n")
        for r in sorted(rows, key=lambda r: tuple(str(r[k]) for k in key_cols)):
            keys = " ".join(str(r[k]) for k in key_cols)
            fh.write(f"{keys} {r['rate']:.6f}\n")

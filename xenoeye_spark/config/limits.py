"""Per-key threshold files (monit-objects-mavg-limfile.c, CONFIG.md:438-469).

CSV keyed by the mavg key-field tuple in declared order, last column the
threshold; '#' comments and blank lines allowed; keys absent from the file
fall back to the section's ``default``. Loaded both as a plain dict (for
the stateful streaming op) and as a DataFrame (for the batch broadcast
join in operators.mavg.mavg_overlimit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parse_limits_lines(lines, n_keys: int) -> dict[tuple, float]:
    out: dict[tuple, float] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split(",")]
        if len(parts) != n_keys + 1:
            continue  # malformed line skipped (reference skips quietly)
        out[tuple(parts[:n_keys])] = float(parts[n_keys])
    return out


def load_limits_csv(path: str, n_keys: int) -> dict[tuple, float]:
    with open(path) as fh:
        return parse_limits_lines(fh, n_keys)


def limits_df(
    spark: SparkSession, limits: dict[tuple, float], key_cols: list[str]
) -> DataFrame:
    """dict -> (key_cols..., threshold) DataFrame for broadcast joins."""
    rows = [(*k, v) for k, v in limits.items()]
    schema = ", ".join(f"{k} string" for k in key_cols) + ", threshold double"
    return spark.createDataFrame(rows, schema)

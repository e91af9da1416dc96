"""Classification — periodic top-percent model build + per-record labeling.

Reference: classification.c. Every cycle: aggregate flows by the classifier
key fields with a single SUM value, sort descending, keep classes until the
cumulative value covers ``top_percents`` % of the total
(classification.c:540-608, two passes: total then scan), then stamp the
class label onto subsequent flows via lookup (classification.c:873-958;
unmatched -> empty string, :954-956).

Spark shape: the model is a small aggregated table -> broadcast stream-static
join stamps labels on the next micro-batch (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_percent_classes(
    agg_df: DataFrame,
    key_cols: list[str],
    val_col: str,
    top_percents: int,
) -> DataFrame:
    """Keep the sorted-desc rows whose *preceding* cumulative sum has not yet
    reached ``top_percents`` % of the total — i.e. emit classes until
    coverage is reached, inclusive of the row that crosses the line.

    Deterministic under ties: orders by (val desc, keys asc).
    The aggregated class table is tiny, so the single-partition window over
    it is not a scale concern (the heavy lifting is the upstream groupBy).
    """
    order = [F.col(val_col).desc()] + [F.col(k).asc_nulls_last() for k in key_cols]
    w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    with_cum = agg_df.withColumn(
        "_prev_cum", F.coalesce(F.sum(F.col(val_col)).over(w_cum), F.lit(0))
    ).withColumn("_total", F.sum(F.col(val_col)).over(Window.partitionBy()))
    kept = with_cum.filter(
        F.col("_prev_cum") * F.lit(100) < F.lit(top_percents) * F.col("_total")
    )
    return kept.drop("_prev_cum", "_total")


def stamp_classes(
    flows: DataFrame,
    class_table: DataFrame,
    key_cols: list[str],
    class_col: str = "class0",
    name_col: str = "class_name",
) -> DataFrame:
    """Stamp the class label onto flows via broadcast join; unmatched rows
    get '' (classification.c:954-956)."""
    ct = class_table.select(
        *[F.col(k) for k in key_cols], F.col(name_col).alias("_cls_name")
    )
    out = flows.join(F.broadcast(ct), on=key_cols, how="left")
    return out.withColumn(class_col, F.coalesce(F.col("_cls_name"), F.lit(""))).drop(
        "_cls_name"
    )


# ---------------------------------------------------------------------------
# Human-readable class naming (classification.c:382-457): protocol numbers,
# service ports, and TCP-flag text rendered into the class label.
# ---------------------------------------------------------------------------

# IANA protocol numbers (getprotobynumber equivalent, fixed so results do
# not depend on the host's /etc/protocols)
PROTO_NAMES: dict[int, str] = {
    1: "icmp", 2: "igmp", 4: "ipv4", 6: "tcp", 17: "udp", 41: "ipv6",
    47: "gre", 50: "esp", 51: "ah", 58: "ipv6-icmp", 88: "eigrp",
    89: "ospf", 112: "vrrp", 132: "sctp", 137: "mpls-in-ip",
}


def class_name_expr(field_name: str, col: Column) -> Column:
    """Render one classifier key field as the reference names classes:
    proto -> protocol name, ports -> service names, tcp-flags -> flag text,
    anything else -> string value."""
    from xenoeye_spark.functions.scalar import portstr, tfstr

    lname = field_name.lower().replace(" ", "")
    if lname in ("proto", "protocol"):
        pairs: list[Column] = []
        for num, name in PROTO_NAMES.items():
            pairs.append(F.lit(num))
            pairs.append(F.lit(name))
        m = F.create_map(*pairs)
        return F.coalesce(m[col.cast("int")], col.cast("string"))
    if "port" in lname:
        return portstr(col)
    if "flags" in lname or "tcp-flags" in lname:
        return tfstr(col)
    return col.cast("string")


def default_class_names(
    model: DataFrame, key_fields: list[str], name_col: str = "class_name"
) -> DataFrame:
    """Join the per-field rendered names with '+' into one label."""
    parts = [class_name_expr(k, F.col(k)) for k in key_fields]
    return model.withColumn(name_col, F.concat_ws("+", *parts))


class ClassDB:
    """Filesystem class database mirroring the reference layout
    clsf/<mo>/<id>/<class>/{name,stats} (classification.c:245-379,459-522):
    users rename classes by editing the ``name`` file; renames are re-read
    every cycle and win over generated names."""

    def __init__(self, root: str, mo_name: str, classifier_id: int):
        import os
        self.dir = os.path.join(root, mo_name, str(classifier_id))
        os.makedirs(self.dir, exist_ok=True)

    @staticmethod
    def _dirname(class_key: str) -> str:
        """Bijective filesystem-safe encoding: a plain '/'->'_' replace
        collided distinct keys ('a/b' vs 'a_b' shared one directory) and
        broke rename lookups (load_names returned the MANGLED key, which
        ClassificationLoop's raw-key .get() never matched)."""
        from urllib.parse import quote

        return quote(class_key, safe="")

    def write_cycle(self, rows: list[tuple[str, str, float]]) -> None:
        """rows: (class_key, generated_name, stat_value). Existing ``name``
        files are preserved (user renames); ``stats`` always rewritten."""
        import os
        for class_key, gen_name, val in rows:
            d = os.path.join(self.dir, self._dirname(class_key))
            os.makedirs(d, exist_ok=True)
            name_f = os.path.join(d, "name")
            if not os.path.exists(name_f):
                with open(name_f, "w") as fh:
                    fh.write(gen_name)
            with open(os.path.join(d, "stats"), "w") as fh:
                fh.write(f"{val}\n")

    def load_names(self) -> dict[str, str]:
        import os
        out = {}
        if not os.path.isdir(self.dir):
            return out
        from urllib.parse import unquote

        for entry in os.listdir(self.dir):
            name_f = os.path.join(self.dir, entry, "name")
            if os.path.isfile(name_f):
                # decode back to the RAW class key so rename lookups
                # match what the classification loop computes
                out[unquote(entry)] = open(name_f).read().strip()
        return out

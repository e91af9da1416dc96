"""Streaming classification — the periodic model-build + next-batch
labeling feedback loop (classification.c, SURVEY.md §2.10).

Every cycle the reference aggregates the window, keeps the classes
covering ``top_percents``% of traffic, writes them to the filesystem class
DB (where users may rename them), reloads, and stamps the class label on
every subsequent flow.

Spark shape: inside ``foreachBatch``, (1) stamp this micro-batch with the
model built from the PREVIOUS batch — matching the reference's one-cycle
lag — then (2) rebuild the model from this batch and persist it through
the ClassDB so renames survive. The model is a handful of rows: kept
driver-side and broadcast into the stamp join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xenoeye_spark.operators.classify import (
    ClassDB,
    default_class_names,
    stamp_classes,
    top_percent_classes,
)


class ClassificationLoop:
    def __init__(
        self,
        key_cols: list[str],
        val_col: str,
        top_percents: int,
        class_col: str = "class0",
        class_db: ClassDB | None = None,
        output_fn=None,
    ):
        self.key_cols = key_cols
        self.val_col = val_col
        self.top_percents = top_percents
        self.class_col = class_col
        self.db = class_db
        self.output_fn = output_fn
        self._model_rows: list[tuple] = []  # (keys..., class_name)

    def _class_key(self, key_vals) -> str:
        # bijective: components are %-quoted (which escapes '/'), then
        # joined on '/'. A plain '_' join collided distinct multi-key
        # classes — ('10_0', '1') and ('10', '0_1') both made '10_0_1',
        # sharing one ClassDB directory and swapping renames.
        from urllib.parse import quote

        return "/".join(quote(str(v), safe="") for v in key_vals)

    def _current_model(self, spark) -> DataFrame | None:
        if not self._model_rows:
            return None
        schema = ", ".join(f"{k} string" for k in self.key_cols) + ", class_name string"
        return spark.createDataFrame(self._model_rows, schema)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # 1) stamp with last cycle's model (empty label before first
        # model). The join runs on TEMP string-cast copies so the output
        # keeps the source key types in EVERY epoch — overwriting the
        # key columns with strings (and only once a model existed)
        # flipped the output schema between epoch 0 and later epochs,
        # breaking any schema-checked sink.
        model = self._current_model(spark)
        if model is not None:
            jcols = [f"_jk_{k}" for k in self.key_cols]
            keyed = batch_df
            for k, j in zip(self.key_cols, jcols):
                keyed = keyed.withColumn(j, F.col(k).cast("string"))
            m = model
            for k, j in zip(self.key_cols, jcols):
                m = m.withColumnRenamed(k, j)
            stamped = stamp_classes(keyed, m, jcols, self.class_col).drop(*jcols)
        else:
            stamped = batch_df.withColumn(self.class_col, F.lit(""))
        if self.output_fn is not None:
            self.output_fn(stamped, epoch_id)

        # 2) rebuild the model from this batch
        agg = batch_df.groupBy(
            *[F.col(k).cast("string").alias(k) for k in self.key_cols]
        ).agg(F.sum(self.val_col).alias("_val"))
        kept = top_percent_classes(agg, self.key_cols, "_val", self.top_percents)
        named = default_class_names(kept, self.key_cols)
        rows = named.collect()
        renames = self.db.load_names() if self.db else {}
        model_rows = []
        db_rows = []
        for r in rows:
            key_vals = [r[k] for k in self.key_cols]
            ck = self._class_key(key_vals)
            name = renames.get(ck, r["class_name"])
            model_rows.append((*[str(v) for v in key_vals], name))
            db_rows.append((ck, r["class_name"], float(r["_val"])))
        if self.db:
            self.db.write_cycle(db_rows)
            # renames applied next cycle via load_names above
        self._model_rows = model_rows

"""Engine orchestrator — the reference ``main()`` / ``monit_objects_init``
parity layer (xenoeye.c:425-523, monit-objects.c:252-541).

Walks a monitoring-objects directory (``load_mo_dir``), flattens the MO
hierarchy into conjunctive filters (child filters evaluated under the
parent's, netflow.c:213-244), and compiles EVERY standing computation —
fwm windows, mavg overlimit levels (one keyed alert stream per
aggregable field x limit level), and classifications — into
Structured-Streaming writer builders over ONE shared decoded flow
stream, mirroring §3.2's "N concurrent queries share the parsed DF".

Usage::

    eng = Engine("etc/monitoring-objects", exp_dir="exp", state_dir="st")
    queries = eng.start(flows_stream)           # list of StreamingQuery
    ...
    eng.stop(queries)

``builders()`` returns (name, start_fn) pairs instead, for callers that
manage triggers/checkpoints themselves (and for tests, which drive each
query with availableNow over file sources).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xenoeye_spark.config.limits import load_limits_csv
from xenoeye_spark.config.mo import MavgConfig, MoConfig, load_mo_dir
from xenoeye_spark.dsl.compiler import FilterContext
from xenoeye_spark.streaming.act import AlertActionSink, ExtGate
from xenoeye_spark.streaming.classify_stream import ClassificationLoop
from xenoeye_spark.streaming.fwm_stream import fwm_streaming_query
from xenoeye_spark.streaming.mavg_stream import mavg_alert_stream


class Engine:
    def __init__(
        self,
        mo_dir: str,
        ctx: FilterContext | None = None,
        exp_dir: str = "exp",
        state_dir: str = "state",
        checkpoint_root: str | None = None,
        db_type: str = "pg",
        ch_codec: str = "",
        run_scripts: bool = True,
        silent_watch: bool = True,
        exact_mfreq: bool = False,
        mavg_backend: str = "apply",
    ):
        self.mos = load_mo_dir(mo_dir)
        self.mo_dir = mo_dir
        self.ctx = ctx or FilterContext()
        self.exp_dir = exp_dir
        self.state_dir = state_dir
        # Default checkpoints under state_dir: the reference persists
        # templates and mavg state across restarts (tkvdb); without a
        # checkpoint every daemon restart would reprocess the spool and
        # re-emit NEW alerts / SQL exports. Pass "" to disable (tests
        # that drive one-shot batches without replay semantics).
        if checkpoint_root is None:
            checkpoint_root = os.path.join(state_dir, "checkpoints")
        self.checkpoint_root = checkpoint_root or None
        self.db_type = db_type
        self.ch_codec = ch_codec
        self.run_scripts = run_scripts
        self.silent_watch = silent_watch
        # exact_mfreq: give each fwm standing query whose OWN filter uses
        # mfreq() a private frequency table with per-trigger snapshots
        # (the reference's per-filter map, filter.c:711-751). Ancestor
        # filters keep the documented min2 approximation — they are
        # compiled once and shared across the whole query tree.
        self.exact_mfreq = exact_mfreq
        # mavg_backend: "apply" = applyInPandasWithState (runs anywhere);
        # "tws" = transformWithStateInPandas (Spark 4 API: native timers
        # for silent keys + state TTL; needs python-protobuf — the
        # vendored runtime via protobuf_compat covers this container)
        if mavg_backend not in ("apply", "tws"):
            raise ValueError(f"mavg_backend must be apply|tws, got {mavg_backend!r}")
        self.mavg_backend = mavg_backend
        self.ext_gate = ExtGate(os.path.join(state_dir, "ext"))

    # -- MO tree -------------------------------------------------------------

    def _walk(self):
        """Yield (path_name, ancestor_filter_or_None, mo) depth-first; the
        node's own filter is NOT in the yielded column — each computation
        applies it, so Catalyst sees ancestor ∧ own as one conjunction."""

        def rec(mo: MoConfig, prefix: str, parent: Column | None):
            name = f"{prefix}/{mo.name}" if prefix else mo.name
            yield name, parent, mo
            eff = mo.filter_column(self.ctx)
            if parent is not None:
                eff = parent & eff
            for ch in mo.children:
                yield from rec(ch, name, eff)

        for mo in self.mos:
            yield from rec(mo, "", None)

    def _ckpt(self, qname: str) -> str | None:
        if self.checkpoint_root is None:
            return None
        return os.path.join(self.checkpoint_root, qname.replace("/", "_"))

    # -- builders ------------------------------------------------------------

    def _mavg_writers(self, name, base, mo, ts_col):
        df = mo.filtered(base, self.ctx)
        for mavg in mo.mavg:
            yield from self._one_mavg(name, df, mavg, ts_col)

    def _one_mavg(self, name, df, mavg: MavgConfig, ts_col):
        keys = [f.column(self.ctx).alias(f.sql_name) for f in mavg.key_fields]
        key_names = [f.sql_name for f in mavg.key_fields]
        for vi, vf in enumerate(mavg.val_fields):
            val = vf.column(self.ctx)
            if "sampling_rate" in df.columns:
                val = val * F.coalesce(F.col("sampling_rate"), F.lit(1))
            proj = df.select(*keys, val.alias("_mval"), F.col(ts_col))
            levels = [(ol, False) for ol in mavg.overlimit] + [
                (ol, True) for ol in mavg.underlimit
            ]
            for ol, under in levels:
                kind = "under" if under else "mavg"
                qname = f"{name}.{kind}.{mavg.name}.{vf.sql_name}.{ol.name}"
                # fallback when no default vector: overlimit -> +inf
                # (never trips, safe); underlimit -> 0.0 (rate < 0 never
                # holds) — an inf underlimit threshold would put every
                # key permanently in breach after the grace window
                fallback = 0.0 if under else float("inf")
                default = (
                    ol.default[vi] if vi < len(ol.default)
                    else (ol.default[0] if ol.default else fallback)
                )
                per_key = None
                if ol.limits_file:
                    if os.path.isfile(ol.limits_file):
                        from xenoeye_spark.config.limits import (
                            coerce_limit_keys,
                        )

                        # CSV keys are strings; the group key holds the
                        # projected columns' TYPED values — coerce by
                        # the actual key dtypes or no limit ever matches
                        ktypes = [dict(proj.dtypes)[k] for k in key_names]
                        per_key = coerce_limit_keys(
                            load_limits_csv(ol.limits_file, len(key_names)),
                            ktypes,
                        )
                    else:
                        import sys

                        print(
                            f"xenoeye: limits file {ol.limits_file!r} for "
                            f"{qname} not found — every key uses the "
                            f"section default {default}",
                            file=sys.stderr,
                        )
                if self.mavg_backend == "tws":
                    from xenoeye_spark.streaming.mavg_tws import (
                        mavg_alert_stream_tws,
                    )

                    if mavg.buckets is not None:
                        # silently running per-key would make the user
                        # believe the scale knob is active (r8 review)
                        raise ValueError(
                            f"mavg section {mavg.name!r}: 'buckets' is "
                            "an apply-backend knob; the tws backend "
                            "keys state per flow key (use "
                            "mavg_backend='apply' or drop the knob)"
                        )
                    if mavg.precombine:
                        # the tws JVM fold was deleted r11 (measured
                        # adverse twice — SCALE.md §Round-11); only the
                        # apply backend has a precombine
                        raise ValueError(
                            f"mavg section {mavg.name!r}: 'precombine' "
                            "is an apply-backend knob (the tws JVM "
                            "fold was retired; use mavg_backend="
                            "'apply' or drop the knob)"
                        )
                    # timers replace the apply-path's silent watch
                    alerts = mavg_alert_stream_tws(
                        proj, key_names, "_mval",
                        window_sec=mavg.time,
                        threshold=default,
                        back2norm_sec=ol.back2norm_time,
                        ts_col=ts_col,
                        thresholds=per_key,
                        under=under,
                    )
                else:
                    buckets = mavg.buckets
                    if buckets == "auto":
                        # ~8x the session's cores: blobs stay a few
                        # thousand keys at carrier cardinality while
                        # every core gets bucket-groups to work on
                        # (SCALE.md §Round-8 sizing rule)
                        buckets = 8 * max(
                            1,
                            proj.sparkSession.sparkContext
                            .defaultParallelism,
                        )
                    alerts = mavg_alert_stream(
                        proj, key_names, "_mval",
                        window_sec=mavg.time,
                        threshold=default,
                        back2norm_sec=ol.back2norm_time,
                        ts_col=ts_col,
                        thresholds=per_key,
                        under=under,
                        silent_watch=self.silent_watch,
                        precombine=mavg.precombine,
                        buckets=buckets,
                    )
                sink = AlertActionSink(
                    mo_name=name.replace("/", "_"),
                    mavg_name=mavg.name,
                    limit_name=ol.name,
                    key_cols=key_names,
                    notif_dir=os.path.join(self.state_dir, "notifications"),
                    action_script=ol.action_script,
                    back2norm_script=ol.back2norm_script,
                    ext=ol.ext,
                    ext_gate=self.ext_gate,
                    run_scripts=self.run_scripts,
                )

                def make_writer(alerts=alerts, sink=sink, qname=qname):
                    w = (
                        alerts.writeStream.foreachBatch(sink.process_batch)
                        .outputMode("append").queryName(qname)
                    )
                    ck = self._ckpt(qname)
                    return w.option("checkpointLocation", ck) if ck else w

                yield qname, make_writer

    def _classification_writers(self, name, base, mo, ts_col):
        df = mo.filtered(base, self.ctx)
        for cl in mo.classification:
            qname = f"{name}.clsf.{cl.id}"
            keys = [f.column(self.ctx).alias(f.sql_name) for f in cl.fields]
            key_names = [f.sql_name for f in cl.fields]
            val = cl.val.column(self.ctx)
            # per-device sampling multiplier, like the fwm and mavg
            # paths (monit-objects.c:995) — without it a 1:1000 device's
            # traffic is underweighted 1000x in the class model
            if "sampling_rate" in df.columns:
                val = val * F.coalesce(F.col("sampling_rate"), F.lit(1))
            proj = df.select(*keys, val.alias("_cval"))
            from xenoeye_spark.operators.classify import ClassDB

            # filesystem class DB under state_dir (classification.c
            # clsf/<mo>/<id>/<class>/{name,stats}): stats rewritten per
            # cycle, user renames in `name` files win next cycle
            loop = ClassificationLoop(
                key_cols=key_names,
                val_col="_cval",
                top_percents=cl.top_percents,
                class_col=f"class{cl.id}",
                class_db=ClassDB(
                    os.path.join(self.state_dir, "clsf"),
                    name.replace("/", "_"),
                    cl.id,
                ),
            )

            def make_writer(proj=proj, loop=loop, qname=qname, cl=cl):
                w = (
                    proj.writeStream.foreachBatch(loop.process_batch)
                    .outputMode("append").queryName(qname)
                    # honor the configured cycle period — the default
                    # ASAP trigger would rebuild + collect the model
                    # every micro-batch (classification.c cycle time)
                    .trigger(processingTime=f"{cl.time} seconds")
                )
                ck = self._ckpt(qname)
                return w.option("checkpointLocation", ck) if ck else w

            yield qname, make_writer

    def builders(self, flows_stream: DataFrame, ts_col: str = "ts"):
        """All standing queries as (query_name, make_writer) pairs.
        ``make_writer()`` returns a DataStreamWriter ready for
        ``.trigger(...).start()``."""
        out = []
        for name, parent_col, mo in self._walk():
            base = (
                flows_stream if parent_col is None
                else flows_stream.filter(parent_col)
            )
            mf_pairs: list[tuple[str, str]] = []
            if self.exact_mfreq and mo.filter.strip():
                from xenoeye_spark.dsl.compiler import find_mfreq_field_pairs

                mf_pairs = find_mfreq_field_pairs(mo.filter, self.ctx)
            for fwm in mo.fwm:
                qname = f"{name}.fwm.{fwm.name}"
                # extended windows stay dormant until an overlimit with
                # this fwm in its ext list trips (monit-objects.c:943-952)
                gate = self.ext_gate if fwm.extended else None

                def make_writer(base=base, mo=mo, fwm=fwm, qname=qname,
                                gate=gate, mf_pairs=mf_pairs):
                    exp = os.path.join(self.exp_dir, qname.replace("/", "_"))
                    table = qname.replace("/", "_").replace(".", "_")

                    def sink(result, epoch_id, _exp=exp, _g=gate, _fwm=fwm,
                             _table=table):
                        if _g is not None and not _g.is_active(_fwm.name):
                            return
                        from xenoeye_spark.streaming.fwm_stream import (
                            fwm_sql_export,
                        )

                        fwm_sql_export(
                            result, _table, _exp, epoch_id,
                            db_type=self.db_type, ch_codec=self.ch_codec,
                        )

                    mf_state = None
                    if mf_pairs:
                        from xenoeye_spark.streaming.mfreq_stream import (
                            MfreqState,
                        )

                        # per-query frequency map; the shared ctx is safe
                        # as-is — fwm_streaming_query binds the snapshot
                        # factory into a per-batch copy, never the ctx
                        mf_state = MfreqState()
                    return fwm_streaming_query(
                        base, mo, fwm, self.ctx, ts_col=ts_col,
                        sink_fn=sink, checkpoint_dir=self._ckpt(qname),
                        available_now=False,
                        mfreq_state=mf_state, mfreq_pairs=mf_pairs,
                    )

                out.append((qname, make_writer))
            out.extend(self._mavg_writers(name, base, mo, ts_col))
            out.extend(self._classification_writers(name, base, mo, ts_col))
        return out

    # -- lifecycle -----------------------------------------------------------

    def start(self, flows_stream: DataFrame, ts_col: str = "ts"):
        """Start every standing query; returns the StreamingQuery list."""
        return [make().start() for _, make in self.builders(flows_stream, ts_col)]

    def stop(self, queries) -> None:
        for q in queries:
            try:
                q.stop()
            except Exception:
                pass

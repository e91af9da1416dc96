"""xenoeye_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vmxdev/xenoeye (NetFlow/IPFIX/sFlow
collector-analyzer), re-expressed Spark-first.

Layout
------
- ``catalog``    : static flow-field catalog -> Spark StructType
                   (reference: netflow.def, filter.def, filter-ag.def)
- ``dsl``        : the BPF-like filter DSL -> pyspark Column ASTs
                   (reference: filter-lexer.c / filter-parser.c / filter.c)
- ``functions``  : scalar functions usable in filters and group-by keys
                   (reference: filter.h:396-418, monit-objects.c:679-876)
- ``operators``  : fwm window aggregation, top-N+others, classification,
                   moving averages (reference: monit-objects-*.c)
- ``enrich``     : dimension enrichment — IP lists, GeoIP/ASN LPM, devices
                   (reference: iplist.c, geoip.c, devices.c)
- ``sources``    : flow schema readers / NetFlow decoders
- ``streaming``  : Structured Streaming wiring of the above
- ``datapipe``   : large-scale training-data ops (dedup, similarity,
                   text analysis, multimodal) — beyond-reference surface
- ``config``     : mo.conf-style JSON -> pipeline builder
"""

__version__ = "0.1.0"

# curated top-level API, imported lazily so `import xenoeye_spark` stays
# cheap (pyspark sub-imports only happen when a symbol is touched)
_EXPORTS = {
    "get_spark": "xenoeye_spark.session",
    "flow_schema": "xenoeye_spark.catalog",
    "compile_filter": "xenoeye_spark.dsl.compiler",
    "FilterContext": "xenoeye_spark.dsl.compiler",
    "parse_field": "xenoeye_spark.dsl.fields",
    "MoConfig": "xenoeye_spark.config.mo",
    "load_mo_dir": "xenoeye_spark.config.mo",
    "Engine": "xenoeye_spark.engine",
    "top_n_with_others": "xenoeye_spark.operators.topn",
    "xe_rep": "xenoeye_spark.operators.report",
    "mavg_alert_stream": "xenoeye_spark.streaming.mavg_stream",
    "pcap_flows_df": "xenoeye_spark.sources.pcap",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)

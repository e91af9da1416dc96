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

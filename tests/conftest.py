from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from xenoeye_spark.protobuf_compat import ensure_protobuf

# Must run BEFORE the JVM launches: transformWithState spawns python
# workers whose PYTHONPATH is frozen from the driver env at JVM start —
# set here so the vendored protobuf reaches them no matter which test
# subset runs (a module-level call in test_mavg_tws only covers runs
# that collect that file).
ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("xenoeye-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()

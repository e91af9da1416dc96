from xenoeye_spark.config.mo import (  # noqa: F401
    ClassificationConfig,
    FwmConfig,
    MavgConfig,
    MoConfig,
    OverlimitConfig,
    load_mo_dir,
    parse_jsonc,
)

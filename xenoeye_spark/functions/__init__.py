from xenoeye_spark.functions.scalar import (
    xdiv,
    div_r,
    div_l,
    min2,
    tfstr,
    portstr,
    ppstr,
    ip4_to_str,
    str_to_ip4,
)

__all__ = [
    "xdiv", "div_r", "div_l", "min2", "tfstr", "portstr", "ppstr",
    "ip4_to_str", "str_to_ip4",
]

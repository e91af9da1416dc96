from xenoeye_spark.operators.topn import top_n_with_others
from xenoeye_spark.operators.fwm import fwm_aggregate, FwmSpec
from xenoeye_spark.operators.classify import top_percent_classes

__all__ = ["top_n_with_others", "fwm_aggregate", "FwmSpec", "top_percent_classes"]

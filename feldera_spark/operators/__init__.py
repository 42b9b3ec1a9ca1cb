from feldera_spark.operators.joins import asof_join, range_join  # noqa: F401
from feldera_spark.operators.keyed import latest_by_key, neighborhood, topk_per_group  # noqa: F401
from feldera_spark.operators.recursion import fixpoint  # noqa: F401

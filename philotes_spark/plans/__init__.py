from philotes_spark.plans.audit import (  # noqa: F401
    PlanAudit,
    audit,
    count_broadcast_joins,
    count_shuffles,
    forced_broadcast_hints,
    physical_plan,
    pushed_filters,
    scan_columns,
)
from philotes_spark.plans.joins import (  # noqa: F401
    BOUNDED_DIMS,
    SCALING_TABLES,
    dim,
)

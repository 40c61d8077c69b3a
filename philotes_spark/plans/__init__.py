from philotes_spark.plans.audit import (  # noqa: F401
    PlanAudit,
    audit,
    count_broadcast_joins,
    count_shuffles,
    physical_plan,
    pushed_filters,
    scan_columns,
)

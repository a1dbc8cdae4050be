from fastpyvectordb_spark.plans.advisor import (  # noqa: F401
    physical_plan,
    plan_report,
    assert_scale_safe,
)

"""Plan inspection & assertion surface (SURVEY.md §3.2, §4.2).

The reference executes operators exactly as written with no optimizer
(SURVEY §4.1). This engine delegates to Catalyst — so its "optimizer
work" is *verifying* that the optimizations actually fire: filters reach
the parquet scan, small dims broadcast, top-K fuses into
TakeOrderedAndProject, aggregates run partial+final. These helpers turn
``df.explain`` output into assertable facts; tests/test_plans.py pins
them for every headline query shape.
"""

from jubilant_garbanzo_spark.plans.inspect import (  # noqa: F401
    advise,
    codegen_stage_count,
    formatted_plan,
    has_partial_aggregate,
    join_strategies,
    pushed_filters,
    scan_read_schema,
    uses_take_ordered,
)

from foresttime_builder_spark.streaming.events import (
    dedup_stream,
    purchase_attribution,
    purchase_attribution_outer,
    read_event_stream,
    run_to_memory,
    running_user_totals,
    sessionized,
    windowed_rollup,
)

__all__ = [
    "dedup_stream",
    "purchase_attribution",
    "purchase_attribution_outer",
    "read_event_stream",
    "run_to_memory",
    "running_user_totals",
    "sessionized",
    "windowed_rollup",
]

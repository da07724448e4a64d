from .introspect import (  # noqa: F401
    count_exchanges,
    final_plan,
    formatted_plan,
    join_strategies,
    partial_agg_functions,
    pushed_filters,
    read_schemas,
)

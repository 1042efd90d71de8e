from commerce_data_pipeline_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    num_shuffles,
    pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    whole_stage_codegen_spans,
)

from data_pipeline_kafka_ek_spark.functions.scalars import (
    concat_strict,
    json_get,
    timestamp_to_string,
)

__all__ = ["concat_strict", "json_get", "timestamp_to_string"]

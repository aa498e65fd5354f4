from data_pipeline_kafka_ek_spark.sources.tables import TABLES, load_table, load_all

__all__ = ["TABLES", "load_table", "load_all"]

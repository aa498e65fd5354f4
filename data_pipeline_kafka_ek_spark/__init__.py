"""data_pipeline_kafka_ek_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference pipeline ``sinhaGuild/data-pipeline-kafka-EK`` (a Kafka + ksqlDB +
Kafka Connect + Elasticsearch streaming stack; see SURVEY.md), expressed
idiomatically on Apache Spark:

* batch + streaming share one set of ``DataFrame -> DataFrame`` transforms
  (ksqlDB's stream/table duality maps onto Spark's unified engine);
* all relational work is declarative DataFrame/SQL so Catalyst handles
  pushdown, pruning, join strategy and AQE;
* sources/sinks are thin adapters at the edges (Kafka, JDBC-snapshot CDC,
  Elasticsearch/Mongo/webhook via ``foreachBatch``);
* large-scale extension operators (dedup, similarity search, text analysis,
  multimodal plumbing) designed for 100 TB-class inputs.
"""

from data_pipeline_kafka_ek_spark.engine import Engine
from data_pipeline_kafka_ek_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"

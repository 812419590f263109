"""pipegen_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the `mcolomerc/pipegen` reference
(Go CLI orchestrating Kafka + Flink SQL; see SURVEY.md).

Architecture is Spark-first: the relational surface is expressed with the
DataFrame / Spark SQL API so Catalyst + Tungsten choose physical plans
(predicate pushdown, broadcast joins, whole-stage codegen, AQE). Custom
operators (dedup, similarity search, text analysis, multimodal) compose
built-in functions; Python UDFs are avoided in hot paths.
"""

__version__ = "0.1.0"

from pipegen_spark.session import get_spark  # noqa: F401

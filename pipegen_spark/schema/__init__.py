"""Schema system: AVRO `.avsc` ⇄ Spark StructType, CSV type inference.

Mirrors the reference's schema handling (internal/pipeline/schema.go,
internal/generator/csv_analyzer.go) with typed Spark structures instead of
the reference's lossy STRING flattening for complex types.
"""

from pipegen_spark.schema.avsc import (  # noqa: F401
    AvroSchema,
    avro_to_struct,
    load_schemas,
    struct_to_avro,
)
from pipegen_spark.schema.inference import CSVAnalyzer  # noqa: F401

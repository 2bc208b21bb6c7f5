"""meerschaum_spark — a PySpark-native incremental-sync analytics engine.

A from-scratch re-expression of the capabilities of bmeares/Meerschaum
(incremental time-series ETL: pipes, sync, dedup, verify, parameterized
query surface) on idiomatic PySpark: DataFrame/SQL plans optimized by
Catalyst, partitioned-Parquet instance storage with MERGE semantics,
plus large-scale training-data operators (dedup families, similarity
search, text analysis, multimodal plumbing).

Reference semantics: /root/reference (Meerschaum v3.4.x); see SURVEY.md.
This is not a port — the execution engine is Spark.
"""

from meerschaum_spark.session import get_spark
from meerschaum_spark.pipe import Pipe, sync_many

__version__ = "0.1.0"

__all__ = ["get_spark", "Pipe", "sync_many", "__version__"]

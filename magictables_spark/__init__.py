"""magictables_spark — a PySpark-native analytics engine with the
capabilities of lekt9/magictables, rebuilt Spark-first.

The reference (studied at /root/reference, see SURVEY.md) is an eager,
single-process Polars library; this package re-expresses every
capability on the Spark DataFrame/SQL stack so plans are optimized by
Catalyst and execute distributed:

- :mod:`magictables_spark.frame`     — MagicFrame (DataFrame wrapper w/ provenance)
- :mod:`magictables_spark.sources`   — raw/api/web/pdf/generative sources
- :mod:`magictables_spark.functions` — json flatten, url templating, text/vector fns
- :mod:`magictables_spark.operators` — enrichment chain, dedup, similarity, as-of, windows
- :mod:`magictables_spark.plans`     — the query registry driving the oracle gate
- :mod:`magictables_spark.warehouse` — parquet-backed cache + lineage (TableGraph analog)
- :mod:`magictables_spark.llm`       — NL->Spark-SQL transform layer (mockable)
"""

from magictables_spark.facade import NotSoMagicFrame
from magictables_spark.frame import MagicFrame
from magictables_spark.session import get_spark
from magictables_spark.warehouse import Warehouse

__all__ = ["MagicFrame", "NotSoMagicFrame", "Warehouse", "get_spark"]
__version__ = "0.1.0"

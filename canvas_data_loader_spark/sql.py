"""SQL API surface: the engine's tables as Spark SQL views.

The DataFrame registry (queries.py) and SQL are two front-ends to the
same Catalyst plans — registering the fixture/warehouse tables as temp
views makes every capability reachable from ``spark.sql(...)`` too
(the query surface the star-schema dw_type vocabulary of the reference
implies, src/api_client.rs:407-408). Parity between the two front-ends
is pinned by tests/test_sql_surface.py on representative shapes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .queries import load

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (events through the
    nanos-safe reader)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)

"""datafusion_impl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference crate ``elnatan1990/datafusion-impl`` (see ``SURVEY.md``), built
Spark-first: logical plans are declared through the DataFrame/SQL API and
Catalyst/Tungsten pick the physical strategy. Custom kernels (the
``regexp_extract`` parity UDF, dedup, similarity search, text analysis)
live in Python only where built-in operators genuinely can't express the
semantics, and then as Arrow-vectorized pandas UDFs.

Layout:
    session     SparkSession factory with scale-aware defaults
    sources     table registry / readers (parquet, csv, values)
    functions   scalar function surface (regexp, text, vectors)
    operators   composed operators (dedup, similarity, multimodal, relational)
    plans       declarative query definitions (tpch-ish, analytics)
    streaming   Structured Streaming operators over the events table
"""

from datafusion_impl_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"

from datafusion_impl_spark.sources.registry import TABLES, load_table, register_all  # noqa: F401

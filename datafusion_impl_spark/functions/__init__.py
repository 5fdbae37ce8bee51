from datafusion_impl_spark.functions.regexp import (  # noqa: F401
    regexp_extract,
    regexp_extract_safe,
    register_regexp,
)

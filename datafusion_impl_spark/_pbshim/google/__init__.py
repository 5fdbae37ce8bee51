"""Namespace stub so ``google.protobuf`` resolves to the shim package when
``datafusion_impl_spark/_pbshim`` is on ``sys.path`` (see
``datafusion_impl_spark.pbshim``)."""

__path__ = __import__("pkgutil").extend_path(__path__, __name__)

"""Declarative query plans.

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB-compatible ANSI SQL). The driver contract
(``__spark_entry__.py``) merges them.

Determinism rules used throughout (so the driver's order-insensitive value-hash
matches DuckDB exactly):
- money/quantity aggregates go through DECIMAL(12,4) casts — decimal sums are
  exact and order-independent in both engines — and are cast to DOUBLE only at
  the very end;
- averages are computed as exact-decimal-sum cast to double, divided by count
  (identical IEEE arithmetic in both engines);
- every LIMIT/top-k query carries a unique tie-break key in its ORDER BY;
- timestamps are cast to DATE (or compared, never emitted raw) where possible.
"""

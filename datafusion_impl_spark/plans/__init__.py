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
- timestamps are cast to DATE (or compared, never emitted raw) where possible;
- DuckDB widens on aggregation (SUM(int)→HUGEINT, ROW_NUMBER/rank→BIGINT,
  LEAST of mixed ints→BIGINT) — every such column is CAST in the oracle (or
  the Spark side) so both engines emit the same type;
- float folds over arrays are sequential left-to-right with a 0.0 seed on
  both sides (`F.aggregate` ↔ `list_reduce(list_prepend(0.0, …))`) and the
  result is ROUND()ed before any comparison, ranking, or thresholding;
- anything random is replaced by the portable md5-derived hash (sketch seeds,
  hyperplanes, sampling gates, splits) so DuckDB replays it bit-for-bit; the
  two ml.feature-backed variants whose coefficients can't be replayed are
  rows-only by design with pytest recall bounds instead;
- byte-level work the oracle can't express directly is reformulated on a
  shared representation (no BLOB substring in DuckDB → checksums over
  `substr(hex(blob), …)` slices mirrored in Python).
"""

"""Property-based tests (hypothesis) for the regexp parity kernel — the
randomized-testing layer the reference signals intent for (criterion + rand
dev-deps, cargo.toml:15-16) but never shipped.

The kernel is pure Python over pandas Series, so these run without a
SparkSession, mirroring the reference's direct-kernel test layer
(src/regexp-extract.rs:117-229)."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_impl_spark.functions.regexp import regexp_extract_kernel

# Text alphabet deliberately includes regex metacharacters.
_texts = st.text(
    alphabet="abc012-.$()[ ", min_size=0, max_size=30
)
# Patterns drawn from a safe common-dialect subset (SURVEY §2.1 point 10)
# plus deliberately-invalid ones.
_patterns = st.sampled_from(
    [
        r"(\d+)",
        r"(\w+)-(\w+)",
        r"-(\d+)-",
        r"(.*)",
        r"([abc]+)\.",
        r"\$(\d+)",
        r"(",          # invalid
        r"[invalid",   # invalid
    ]
)
_groups = st.integers(min_value=-2, max_value=4)


def _expected(text, pattern, grp):
    """Independent scalar reimplementation of the reference contract."""
    if text is None or pattern is None or grp is None:
        return None
    try:
        rx = re.compile(pattern)
    except re.error:
        return ""
    if grp < 0 or grp > rx.groups:
        return ""
    m = rx.search(text)
    if m is None:
        return ""
    return m.group(grp) or ""


@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), _texts),
            st.one_of(st.none(), _patterns),
            st.one_of(st.none(), _groups),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_kernel_matches_reference_contract(rows):
    t, p, g = zip(*rows)
    got = regexp_extract_kernel(
        pd.Series(t, dtype="object"),
        pd.Series(p, dtype="object"),
        pd.Series(g, dtype="object"),
    ).tolist()
    assert got == [_expected(*r) for r in rows]


@settings(max_examples=100, deadline=None)
@given(texts=st.lists(_texts, min_size=1, max_size=50))
def test_kernel_batch_equals_rowwise(texts):
    """Batch evaluation must equal row-at-a-time evaluation (vectorization
    cannot change semantics — the reference's kernel invariant)."""
    pat, grp = r"(\d+)", 1
    batch = regexp_extract_kernel(
        pd.Series(texts, dtype="object"),
        pd.Series([pat] * len(texts), dtype="object"),
        pd.Series([grp] * len(texts), dtype="object"),
    ).tolist()
    single = [
        regexp_extract_kernel(
            pd.Series([t], dtype="object"),
            pd.Series([pat], dtype="object"),
            pd.Series([grp], dtype="object"),
        ).iloc[0]
        for t in texts
    ]
    assert batch == single

"""Registry-wide plan audit: every registered query's plan is EXPLAINed and
checked against the scale invariants the per-operator tests enforce locally —
turning the 100 TB discipline into a single fence no new query can slip past.

Rules (on the optimized logical plan + physical plan string):

- no CartesianProduct anywhere (broadcast-nested-loop over a scalar/constant
  frame is fine and planned differently);
- no GLOBAL Sort except (a) the root presentation ``orderBy`` every query
  carries for oracle determinism, (b) a sort feeding a Limit (top-k →
  TakeOrdered), or (c) a sort whose input subtree is bounded (sits above an
  Aggregate / Limit / local relation — e.g. sorting per-group summaries);
- no Window with an EMPTY partitionSpec unless its input subtree is bounded
  the same way (e.g. ranking ~80 monthly aggregate rows is fine; a global
  row_number over a fact table is not);
- no loop-invariant higher-order function inside a lambda body: an
  ArrayTransform/ArrayFilter/... whose subtree references NONE of the
  enclosing lambda's variables is re-evaluated per element (Catalyst inlines
  the shared Column at every call site), turning an O(n) expression into
  O(n²) per row — the r9 `source_bigram_perplexity` defect
  (`element_at(transform(t, ...), i)` inside a position lambda). The fix
  pattern is to materialize the invariant array in its own projection.

"Bounded" is structural, not statistical: an Aggregate's output cardinality
is its group count, which every query here keeps intentionally small
(dims/flags/months/buckets), and a Limit is bounded by construction.
"""

from __future__ import annotations

import __spark_entry__ as entry
from tests.conftest import SF_DIR


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _cls(node) -> str:
    return node.getClass().getSimpleName()


#: Logical nodes that bound their output row count regardless of input.
_BOUNDING = {
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "LocalRelation",
    "OneRowRelation",
    "Range",
}


def _is_bounded(node) -> bool:
    """Path-aware boundedness: a subtree is bounded iff EVERY data-flow path
    from this node down reaches a bounding operator. An any-descendant check
    would wrongly exempt e.g. fact.join(dim.groupBy(...).agg(...)) — the
    aggregate bounds only the dimension side while the join output stays one
    row per fact row."""
    if _cls(node) in _BOUNDING:
        return True
    kids = _children(node)
    if not kids:
        return False  # leaf relation / file scan: unbounded
    # joins/unions are bounded only if ALL inputs are; unary nodes
    # (Project/Filter/Window/Sort/Generate/...) inherit the child's bound
    return all(_is_bounded(k) for k in kids)


#: expression classes that evaluate a lambda over every element of their
#: input collection — expensive when re-evaluated per element of an
#: ENCLOSING lambda.
_HOF = {
    "ArrayTransform",
    "ArrayFilter",
    "ArrayExists",
    "ArrayForAll",
    "ArrayAggregate",
    "ArraySort",
    "ZipWith",
    "MapFilter",
    "TransformKeys",
    "TransformValues",
    "MapZipWith",
}


def _expr_walk(e):
    yield e
    seq = e.children()
    for i in range(seq.size()):
        yield from _expr_walk(seq.apply(i))


def _lambda_arg_ids(lam) -> set[int]:
    seq = lam.arguments()
    return {seq.apply(i).exprId().id() for i in range(seq.size())}


def _free_lambda_var_ids(e) -> set[int]:
    """NamedLambdaVariable exprIds referenced in ``e``'s subtree but not
    bound by a LambdaFunction within that subtree."""
    bound: set[int] = set()
    used: set[int] = set()
    for n in _expr_walk(e):
        c = _cls(n)
        if c == "LambdaFunction":
            bound |= _lambda_arg_ids(n)
        elif c == "NamedLambdaVariable":
            used.add(n.exprId().id())
    return used - bound


def _audit_recompute(name: str, root) -> list[str]:
    """Flag loop-invariant higher-order functions inside lambda bodies: a
    HOF in a lambda whose subtree references none of the lambda's variables
    re-runs in full for EVERY element the enclosing lambda visits —
    O(n)→O(n²) per row. (An HOF that does use the variable is a genuinely
    element-dependent computation and is not flagged.)"""
    problems: list[str] = []
    for node in _walk(root):
        exprs = node.expressions()
        for i in range(exprs.size()):
            top = exprs.apply(i)
            # cheap prefilter: one py4j string fetch vs thousands of walks
            if "lambdafunction" not in top.toString():
                continue
            for e in _expr_walk(top):
                if _cls(e) != "LambdaFunction":
                    continue
                bound = _lambda_arg_ids(e)
                for h in _expr_walk(e.function()):
                    if _cls(h) in _HOF and not (
                        _free_lambda_var_ids(h) & bound
                    ):
                        problems.append(
                            f"{name}: loop-invariant {_cls(h)} re-evaluated"
                            f" inside lambda — materialize it in its own"
                            f" projection first"
                        )
    return sorted(set(problems))


def _strip_presentation_root(node):
    """Drop the root Project/Sort/Limit chain — the final orderBy (and any
    top-k limit around it) exists for oracle determinism, not as part of the
    computation under audit."""
    while True:
        c = _cls(node)
        if c in ("Project", "Sort", "GlobalLimit", "LocalLimit", "Deduplicate"):
            kids = _children(node)
            if len(kids) == 1:
                node = kids[0]
                continue
        return node


def _audit_one(name: str, df) -> list[str]:
    problems: list[str] = []
    qe = df._jdf.queryExecution()
    physical = qe.executedPlan().toString()
    if "CartesianProduct" in physical:
        problems.append(f"{name}: CartesianProduct in physical plan")

    problems.extend(_audit_recompute(name, qe.optimizedPlan()))

    root = _strip_presentation_root(qe.optimizedPlan())
    # parent map so a global Sort directly under a Limit (top-k) is exempt
    limit_children = set()
    for node in _walk(root):
        if _cls(node) in ("GlobalLimit", "LocalLimit"):
            # look through interposed Projects: Limit → Project* → Sort is
            # Spark's TakeOrderedAndProject shape (top-k, never a full sort)
            for c in _children(node):
                while _cls(c) == "Project" and len(_children(c)) == 1:
                    limit_children.add(c.hashCode())
                    c = _children(c)[0]
                limit_children.add(c.hashCode())
    for node in _walk(root):
        c = _cls(node)
        if c == "Sort":
            is_global = bool(getattr(node, "global")())
            if (
                is_global
                and node.hashCode() not in limit_children
                and not _is_bounded(node)
            ):
                problems.append(f"{name}: unbounded global Sort ({node.simpleStringWithNodeId()})")
        elif c == "Window":
            if node.partitionSpec().size() == 0 and not _is_bounded(node):
                problems.append(f"{name}: unpartitioned Window over unbounded input")
    return problems


def test_audit_catches_known_bad_plans(spark):
    """Negative control: the auditor must flag the anti-patterns it exists
    for (otherwise a green audit proves nothing)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datafusion_impl_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents")
    # global row_number over an unbounded fact table
    bad_window = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert any("Window" in p for p in _audit_one("bad_window", bad_window))
    # ...including when an aggregate exists on the OTHER side of a join: the
    # join output is still one row per fact row, so the window stays global
    # over unbounded input (path-aware boundedness, not any-descendant)
    dim = docs.groupBy("source").count().withColumnRenamed("source", "src")
    bad_joined = docs.join(dim, docs.source == dim.src).withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert any("Window" in p for p in _audit_one("bad_joined_window", bad_joined))
    # loop-invariant HOF recompute — the r9 source_bigram_perplexity defect:
    # a shared transform() Column referenced via element_at inside a
    # position lambda is inlined (hence re-evaluated) at every position
    toks = docs.select(F.split("text", " ").alias("t"))
    mapped = F.transform(
        "t", lambda x: F.when(x == "a", x).otherwise(F.lit("<oov>"))
    )
    bad_recompute = toks.select(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at(mapped, i).alias("a"),
                F.element_at(mapped, i + 1).alias("b"),
            ),
        ).alias("bg")
    )
    assert any(
        "loop-invariant" in p for p in _audit_one("bad_recompute", bad_recompute)
    )
    # ...while the fixed shape (materialize once, zip shifted slices) and an
    # element-DEPENDENT inner HOF both stay clean
    ok_zip = toks.select(mapped.alias("m")).select(
        F.arrays_zip(
            F.slice("m", 1, F.size("m") - 1).alias("a"),
            F.slice("m", 2, F.size("m") - 1).alias("b"),
        ).alias("bg")
    )
    assert not _audit_one("ok_zip", ok_zip)
    ok_dependent = toks.select(
        F.transform(
            "t", lambda x: F.size(F.filter("t", lambda y: y == x))
        ).alias("rank_of")
    )
    assert not [
        p for p in _audit_one("ok_dependent", ok_dependent)
        if "loop-invariant" in p
    ]
    # (no negative control for the interior-global-Sort rule: Catalyst's
    # EliminateSorts removes every simple repro — a sort surviving below a
    # join/union is exactly the optimizer-miss the branch fences against)
    # true cartesian product (hinted: at sf0.01 Spark would otherwise pick a
    # broadcast nested-loop, which is exactly the sanctioned alternative)
    cart = docs.hint("shuffle_replicate_nl").crossJoin(
        docs.select(F.col("doc_id").alias("d2"))
    )
    assert any("CartesianProduct" in p for p in _audit_one("bad_cross", cart))
    # and the sanctioned shapes stay clean
    ok_root_sort = docs.orderBy("doc_id")
    assert not _audit_one("ok_root_sort", ok_root_sort)
    ok_grouped = (
        docs.groupBy("source")
        .count()
        .withColumn("rn", F.row_number().over(Window.orderBy("source")))
    )
    assert not _audit_one("ok_grouped", ok_grouped)


def test_all_registered_queries_pass_plan_audit(spark):
    failures: list[str] = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF_DIR)
        except Exception as exc:  # building the plan must itself succeed
            failures.append(f"{name}: build failed: {exc}")
            continue
        failures.extend(_audit_one(name, df))
    assert not failures, "\n".join(failures)

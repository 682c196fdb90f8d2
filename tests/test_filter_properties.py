"""Property-based parity for predicate semantics (SURVEY §2.2).

Hypothesis generates random attribute maps (absent attribute == NULL, the
reference's null model, queries.go:167-174) and random predicate
conjunctions; the Spark evaluation must agree with a direct Python
transcription of the reference's SatisfiesPredicate logic
(internal/queries/queries.go:159-213) on every row.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from proteus_spark.operators import (
    apply_predicates,
    eq,
    is_not_null,
    is_null,
    range_pred,
)
from proteus_spark.operators.filters import FLOAT_TOLERANCE, approx_eq

# rows: x is a nullable int attribute, y a nullable float attribute
ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20) | st.none(),
        st.floats(min_value=-5, max_value=5, allow_nan=False) | st.none(),
    ),
    min_size=0,
    max_size=25,
)

PRED = st.one_of(
    st.tuples(st.just("eq"), st.integers(min_value=0, max_value=20)),
    st.tuples(
        st.just("range"),
        st.tuples(
            st.integers(min_value=0, max_value=20) | st.none(),
            st.integers(min_value=0, max_value=20) | st.none(),
        ),
    ),
    st.tuples(st.just("isnull"), st.none()),
    st.tuples(st.just("isnotnull"), st.none()),
)


def _py_eval(pred, x) -> bool:
    """queries.go:159-213 transcribed: EQ via degenerate range; RANGE
    lbound-inclusive ubound-exclusive; NULL = attribute absent; any
    predicate other than ISNULL on an absent attribute is false."""
    kind, arg = pred
    if kind == "isnull":
        return x is None
    if x is None:
        return False
    if kind == "isnotnull":
        return True
    if kind == "eq":
        return x == arg
    lb, ub = arg
    if lb is not None and not (x >= lb):
        return False
    if ub is not None and not (x < ub):
        return False
    return True


def _spark_pred(pred):
    kind, arg = pred
    if kind == "eq":
        return eq("x", arg)
    if kind == "range":
        return range_pred("x", arg[0], arg[1])
    if kind == "isnull":
        return is_null("x")
    return is_not_null("x")


@pytest.fixture(scope="module")
def mk_df(spark):
    def make(rows):
        return spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(rows)],
            "rid int, x int, y double",
        )

    return make


@given(rows=ROWS, preds=st.lists(PRED, min_size=1, max_size=3))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_predicate_conjunction_matches_reference_semantics(mk_df, rows, preds):
    df = mk_df(rows)
    got = {r["rid"] for r in apply_predicates(df, [_spark_pred(p) for p in preds]).collect()}
    want = {
        i for i, (x, _) in enumerate(rows) if all(_py_eval(p, x) for p in preds)
    }
    assert got == want


@given(
    rows=ROWS,
    target=st.floats(min_value=-5, max_value=5, allow_nan=False),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_float_tolerance_matches_reference(mk_df, rows, target):
    """utils.go:79-89: float equality is |a-b| < 1e-6."""
    df = mk_df(rows)
    got = {r["rid"] for r in df.filter(approx_eq("y", target)).collect()}
    want = {
        i
        for i, (_, y) in enumerate(rows)
        if y is not None and abs(y - target) < FLOAT_TOLERANCE
    }
    assert got == want


# ---------------------------------------------------------------------------
# Range-join property: bucketized equi-join == naive theta join
# ---------------------------------------------------------------------------

RJ_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=1000),   # ts
    ),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=RJ_ROWS, radius=st.integers(min_value=1, max_value=300))
def test_range_join_matches_naive_theta(spark, rows, radius):
    """The 3-bucket-explode equi-join must produce EXACTLY the naive
    theta-join pair set for any key/ts distribution and radius, including
    boundary-equal |Δts| == radius pairs and duplicate timestamps."""
    from proteus_spark.operators.join import range_join_pairs

    df = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(rows)],
        "key int, rid int, ts long",
    )
    got = {
        (r["key"], r["a_id"], r["b_id"])
        for r in range_join_pairs(
            df, key="key", ts_col="ts", radius=radius, id_col="rid"
        ).collect()
    }
    want = {
        (ka, ia, ib)
        for ia, (ka, ta) in enumerate(rows)
        for ib, (kb, tb) in enumerate(rows)
        if ka == kb and ia < ib and abs(ta - tb) <= radius
    }
    assert got == want

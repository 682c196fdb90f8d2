"""ASTQuery translation — the reference's INTERNAL query representation.

The reference's QPUs exchange queries in two forms (qpuapi.proto:59-81):
client-facing SQL (SQLQuery) and the internal ASTQuery — table +
projection + a conjunction of AttributePredicates + an optional
timestamp predicate + single-attribute ORDER BY + LIMIT (it is what
sqlparse.go lowers SQL INTO, and what QPU-to-QPU requests carry). The
SQL arm has been served since round 1; this module serves the AST arm by
translating it onto the SAME operator layer the SQL queries exercise
(operators/filters.py, operators/topk.py) — one semantics, two
entry representations, so the predicate fidelity tests
(lb-inclusive/ub-exclusive RANGE, absent-attribute NULL semantics,
EQ-as-degenerate-range) cover both.

Scale: the translation is declarative — predicates become Catalyst
filter expressions (pushed to the parquet scan), projection prunes the
read schema, ORDER BY+LIMIT plans as TakeOrderedAndProject. An AST
query is exactly as 100 TB-ready as its SQL twin.

Timestamp predicates: the served snapshot forms are LATEST/ZERO bounds
(the reference's default [LATEST, LATEST] snapshot and the
[ZERO, LATEST] full-history form collapse to the current snapshot for a
batch table). A VECTORCLOCK bound addresses a specific view version —
that is ``SumView.snapshot_at`` territory and needs a view, not a
table, so it is rejected loudly (INVALID_ARGUMENT at the wire layer)
rather than silently served as LATEST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from proteus_spark.operators import filters as FL
from proteus_spark.operators.topk import topk


def _value(v: dict | None):
    """Unwrap a qpu.Value oneof dict ({'str':..}|{'int':..}|{'flt':..})."""
    if not v:
        return None
    for arm in ("str", "int", "flt"):
        if arm in v:
            return v[arm]
    return None


def _predicate_column(p: dict):
    """One AttributePredicate -> a Catalyst boolean Column, reusing the
    reference-exact operators (EQ = degenerate range; RANGE lb incl /
    ub excl; ISNULL = attribute absent)."""
    key = p.get("attr", {}).get("attr_key", "")
    if not key:
        raise ValueError("AttributePredicate without attr.attr_key")
    ptype = p.get("type", "ISNULL")
    if ptype == "ISNULL":
        return FL.is_null(key)
    if ptype == "ISNOTNULL":
        return FL.is_not_null(key)
    lb, ub = _value(p.get("lbound")), _value(p.get("ubound"))
    if ptype == "EQ":
        if lb is None:
            raise ValueError(f"EQ predicate on {key!r} without a bound")
        return FL.eq(key, lb)
    if ptype == "RANGE":
        return FL.range_pred(key, lb, ub)
    raise ValueError(f"unsupported predicate type {ptype!r}")


def _check_ts_predicate(ts: dict | None) -> None:
    for side in ("lbound", "ubound"):
        st = (ts or {}).get(side) or {}
        if st.get("type") == "VECTORCLOCK":
            raise ValueError(
                "VECTORCLOCK snapshot bounds address a versioned view "
                "(snapshot_at), not a batch table; an ASTQuery over a "
                "table serves LATEST only"
            )


def ast_query(spark, ast: dict) -> DataFrame:
    """Build the DataFrame for a decoded ASTQuery dict (wire.decode_ast_
    query's shape): resolve the table from the session catalog, apply
    the predicate conjunction, prune to the projection, then ORDER
    BY/LIMIT. Declarative throughout — Catalyst pushes the filters and
    the projection to the scan."""
    table = ast.get("table", "")
    if not table:
        raise ValueError("ASTQuery without a table")
    _check_ts_predicate(ast.get("tsPredicate"))
    df = spark.table(table)
    preds = [_predicate_column(p) for p in ast.get("predicate", [])]
    if preds:
        df = FL.apply_predicates(df, preds)
    proj = ast.get("projection", [])
    if proj:
        df = df.select(*proj)
    ob = ast.get("orderBy")
    limit = int(ast.get("limit", 0))
    if ob and ob.get("attributeName"):
        if limit > 0:
            # single-attribute ORDER BY + LIMIT is the reference's top-k;
            # plans as TakeOrderedAndProject (no global sort). Tie order
            # among equal keys is backend-dependent in the reference too
            # (mysql_backend.go:349-353).
            df = topk(
                df,
                by=ob["attributeName"],
                k=limit,
                descending=ob.get("direction") == "DESC",
            )
        else:
            df = df.orderBy(
                df[ob["attributeName"]].desc()
                if ob.get("direction") == "DESC"
                else df[ob["attributeName"]].asc()
            )
    elif limit > 0:
        df = df.limit(limit)
    return df

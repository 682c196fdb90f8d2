"""Portable 48-bit hashing — identical results on Spark SQL and DuckDB.

Why not the engines' native hash functions: Spark's ``hash``/``xxhash64``
and DuckDB's ``hash`` are different algorithms, so MinHash/SimHash built on
them could never be oracle-checked. ``md5`` is identical everywhere; we
derive a BIGINT from its first 12 hex chars (48 bits — comfortably inside
BIGINT and exact in a DOUBLE if it ever passes through one) using only
operators both dialects share (substr/ascii/CASE/arithmetic).

Seeding: a family of independent hash functions h_i(s) = H(i || '|' || s)
— one md5 per seed, no permutation arithmetic, no overflow concerns.

At 100 TB scale these expressions run inside whole-stage codegen (they are
plain Catalyst expressions — no UDF, no Python), so hashing shuffles
nothing and costs one pass.
"""

from __future__ import annotations

HEX_PREFIX_LEN = 12  # 48 bits


def _hexdigit_sql(char_sql: str) -> str:
    """hex char -> 0..15 as BIGINT (md5 output is lowercase in both
    engines). The BIGINT cast is load-bearing: without it, digit * 16^k
    stays INT x INT for k <= 7 and overflows under Spark's ANSI mode."""
    return (
        f"CAST(CASE WHEN ascii({char_sql}) >= 97 THEN ascii({char_sql}) - 87 "
        f"ELSE ascii({char_sql}) - 48 END AS BIGINT)"
    )


def hex_to_long_sql(hexcol: str, n: int = HEX_PREFIX_LEN) -> str:
    """BIGINT from the first ``n`` hex chars of column ``hexcol``.

    Positional base-16 expansion; generated once and shared by both engines.
    Keep ``hexcol`` a real column (not an expression) so the md5 isn't
    re-evaluated per digit.
    """
    terms = [
        f"{_hexdigit_sql(f'substr({hexcol}, {i + 1}, 1)')} * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def hex_slice_to_long_sql(hexcol: str, start: int, n: int = HEX_PREFIX_LEN) -> str:
    """Portable BIGINT from ``n`` hex chars of ``hexcol`` starting at
    1-based ``start``. A 32-hex md5 digest yields two independent 48-bit
    hashes (starts 1 and 13) — half the md5 calls for a k-function family."""
    terms = [
        f"{_hexdigit_sql(f'substr({hexcol}, {start + i}, 1)')} * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def hex_slice_to_long_spark_sql(
    hexcol: str, start: int, n: int = HEX_PREFIX_LEN
) -> str:
    """Spark fast path of hex_slice_to_long_sql (see hex_to_long_spark_sql)."""
    return f"CAST(conv(substr({hexcol}, {start}, {n}), 16, 10) AS BIGINT)"


def hex_to_long_spark_sql(hexcol: str, n: int = HEX_PREFIX_LEN) -> str:
    """Spark-only fast path: ``conv`` collapses the 12-digit positional
    expansion (24 substr/ascii calls) into one builtin — ~25× fewer string
    ops in the codegen hot loop. DuckDB has no ``conv``, so oracles keep
    ``hex_to_long_sql``; results are bit-identical (both compute the
    base-16 value of the first ``n`` lowercase hex chars)."""
    return f"CAST(conv(substr({hexcol}, 1, {n}), 16, 10) AS BIGINT)"


def md5_seeded_sql(expr: str, seed: int | str) -> str:
    """Seeded md5 hex digest of a string expression."""
    return f"md5('{seed}|' || {expr})"


def portable_hash_sql(expr: str, seed: int | str = 0) -> str:
    """One-shot 48-bit hash of ``expr`` (md5 evaluated once per digit-set is
    acceptable only for single-use sites; in loops project the md5 into a
    column first and apply ``hex_to_long_sql``)."""
    return hex_to_long_sql_inline(md5_seeded_sql(expr, seed))


def hex_to_long_sql_inline(hex_expr: str, n: int = HEX_PREFIX_LEN) -> str:
    """Like hex_to_long_sql but over an arbitrary expression (beware: the
    expression text is repeated per digit; engines usually CSE it, but
    prefer the column form in hot paths)."""
    terms = [
        f"{_hexdigit_sql(f'substr({hex_expr}, {i + 1}, 1)')} * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def bucket_exprs_sql(
    col_sql: str, seed_prefix: str, k: int, mod: int
) -> list[str]:
    """The k-function bucket-hash family shared by the CMS and Bloom
    sketches: ``hex_to_long(md5(f'{seed_prefix}{i}|' || col)) % mod`` for
    i in [0, k) — one definition so the seed scheme / modulo handling
    cannot drift between operators (oracles regenerate the same family
    via md5_seeded_sql + hex_to_long_sql). Spark-dialect strings (conv
    form: one md5 evaluation per hash); wrap in F.expr."""
    out = []
    for d in range(k):
        md5 = md5_seeded_sql(col_sql, f"{seed_prefix}{d}")
        out.append(f"({hex_to_long_spark_sql(f'({md5})')} % {mod})")
    return out

"""SQL-surface function pack: the engine's reusable scalar operations as
SQL scalar UDFs (Spark 4 `CREATE FUNCTION ... RETURN <expr>`).

These are NOT Python UDFs — the body is a SQL expression, so calls are
analyzed into the same Catalyst tree the DataFrame builders produce and
run fully inside whole-stage codegen. Registering them gives `spark.sql`
users the same vocabulary the DataFrame operators use (cosine similarity,
Jaccard, normalization, token counts, fingerprints) with zero performance
penalty versus inlining the expression.

`TEMPORARY` scope: per-session, like the reference's in-process operator
registry. On a shared deployment, drop TEMPORARY and create them once in
a catalog schema.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Mirrors operators/text.py regexes (single source of semantics). Spark's
# SQL parser unescapes backslashes inside single-quoted literals ('\s' -> 's'),
# so the regex must be embedded with doubled backslashes in the DDL below.
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
_BPE_RE_SQL = _BPE_RE.replace("\\", "\\\\")

_FUNCTIONS: dict[str, str] = {
    "pc_cosine": """
        CREATE TEMPORARY FUNCTION pc_cosine(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
        RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b,
                   (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   0D, (acc, v) -> acc + v)
               / (sqrt(aggregate(a, 0D,
                        (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
                  * sqrt(aggregate(b, 0D,
                        (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
    """,
    "pc_jaccard": """
        CREATE TEMPORARY FUNCTION pc_jaccard(a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS DOUBLE
        RETURN CASE WHEN size(array_union(a, b)) = 0 THEN NULL
               ELSE CAST(size(array_intersect(a, b)) AS DOUBLE)
                    / size(array_union(a, b)) END
    """,
    "pc_norm_text": r"""
        CREATE TEMPORARY FUNCTION pc_norm_text(s STRING)
        RETURNS STRING
        RETURN lower(regexp_replace(trim(s), '\\s+', ' '))
    """,
    "pc_token_count": r"""
        CREATE TEMPORARY FUNCTION pc_token_count(s STRING)
        RETURNS BIGINT
        RETURN CAST(size(split(trim(s), '\\s+')) AS BIGINT)
    """,
    "pc_bpe_token_count": rf"""
        CREATE TEMPORARY FUNCTION pc_bpe_token_count(s STRING)
        RETURNS BIGINT
        RETURN CAST(regexp_count(s, '{_BPE_RE_SQL}') AS BIGINT)
    """,
    "pc_fingerprint": r"""
        CREATE TEMPORARY FUNCTION pc_fingerprint(s STRING)
        RETURNS STRING
        RETURN sha2(lower(regexp_replace(trim(s), '\\s+', ' ')), 256)
    """,
    "pc_word_shingles": r"""
        CREATE TEMPORARY FUNCTION pc_word_shingles(s STRING, n INT)
        RETURNS ARRAY<STRING>
        RETURN array_distinct(transform(
                 sequence(1, greatest(size(split(trim(s), '\\s+')) - n + 1, 1)),
                 i -> concat_ws(' ', slice(split(trim(s), '\\s+'), i, n))))
    """,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create the pc_* SQL function pack in this session; returns names.

    Idempotent: CREATE TEMPORARY FUNCTION replaces silently is not allowed,
    so existing definitions are dropped first.
    """
    for name, ddl in _FUNCTIONS.items():
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
        spark.sql(ddl)
    return list(_FUNCTIONS)

"""SQL scalar-UDF pack: pc_* functions must agree with the DataFrame
operators' column expressions (same Catalyst semantics, codegen-side)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyconnect_spark.catalog import load_table
from pyconnect_spark.functions.sqlfuncs import register_sql_functions
from pyconnect_spark.operators.similarity import cosine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def funcs(spark):
    names = register_sql_functions(spark)
    assert "pc_cosine" in names
    # idempotent re-registration must not raise
    register_sql_functions(spark)
    return names


def test_pc_cosine_matches_column_expr(spark):
    emb = load_table(spark, SF, "embeddings").limit(50)
    emb.createOrReplaceTempView("sqlf_emb")
    got = spark.sql(
        """SELECT a.vec_id, round(pc_cosine(a.embedding, b.embedding), 9) AS c
           FROM sqlf_emb a JOIN sqlf_emb b ON b.vec_id = 1 ORDER BY a.vec_id"""
    ).collect()
    q = emb.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("q"))
    want = (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine(F.col("embedding"), F.col("q")), 9).alias("c"))
        .orderBy("vec_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pc_text_functions(spark):
    load_table(spark, SF, "documents").limit(20).createOrReplaceTempView("sqlf_docs")
    rows = spark.sql(
        """SELECT doc_id,
                  pc_token_count(text) AS n_tok,
                  pc_bpe_token_count(text) AS n_bpe,
                  pc_fingerprint(text) AS fp,
                  pc_norm_text(text) AS norm
           FROM sqlf_docs ORDER BY doc_id"""
    ).collect()
    assert rows and all(r["n_bpe"] >= r["n_tok"] > 0 for r in rows)
    assert all(len(r["fp"]) == 64 for r in rows)
    assert all("  " not in r["norm"] for r in rows)


def test_pc_bpe_token_count_exact_parity(spark):
    """pc_bpe_token_count must equal operators/text.py's n_bpe_tokens exactly.

    Regression test for the SQL-literal backslash bug: Spark's SQL parser
    unescapes '\\s' to 's' in single-quoted literals, which silently turned
    [^A-Za-z0-9\\s] into [^A-Za-z0-9s] and counted whitespace as tokens
    (pc_bpe_token_count('ab cd') returned 3 instead of 2)."""
    from pyconnect_spark.operators.text import _BPE_RE, _count

    assert spark.sql("SELECT pc_bpe_token_count('ab cd') AS n").collect()[0]["n"] == 2
    docs = load_table(spark, SF, "documents").limit(50)
    docs.createOrReplaceTempView("sqlf_docs_bpe")
    got = spark.sql(
        "SELECT doc_id, pc_bpe_token_count(text) AS n FROM sqlf_docs_bpe ORDER BY doc_id"
    ).collect()
    want = (
        docs.select("doc_id", _count("text", _BPE_RE).cast("long").alias("n"))
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pc_jaccard_and_shingles(spark):
    row = spark.sql(
        """SELECT pc_jaccard(pc_word_shingles('a b c d', 2),
                             pc_word_shingles('a b c e', 2)) AS j"""
    ).collect()[0]
    # shingles: {ab,bc,cd} vs {ab,bc,ce} -> intersection 2, union 4
    assert abs(row["j"] - 0.5) < 1e-12


def test_json_roundtrip_and_schema_inference(spark):
    """Completes the survey's JSON-function row: schema_of_json infers the
    props shape, from_json(to_json(struct)) round-trips losslessly."""
    from pyconnect_spark.catalog import load_table

    ev = load_table(spark, SF, "events").limit(50)
    # schema_of_json needs a foldable literal — sample one value driver-side
    sample = ev.select("props").first()["props"]
    inferred = spark.range(1).select(
        F.schema_of_json(F.lit(sample)).alias("s")
    ).first()["s"]
    assert "k" in inferred  # {"k": N} shape

    rt = ev.select(
        "event_id",
        F.from_json(F.to_json(F.struct("event_id", "user_id")), 
                    "event_id BIGINT, user_id BIGINT").alias("j"),
        "user_id",
    ).filter(
        (F.col("j.event_id") != F.col("event_id"))
        | (F.col("j.user_id") != F.col("user_id"))
    )
    assert rt.count() == 0

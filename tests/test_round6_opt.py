"""Round-6 optimization-internals tests: each test pins an operator
restructure from the optimization round to its round-5 semantics (the
gate contracts themselves are pinned by scripts/check_correctness.py)."""

from __future__ import annotations

import pytest


CORPUS = [
    (0, "copyright acme corp alpha beta gamma delta"),
    (1, "copyright acme corp alpha beta gamma epsilon"),
    (2, "copyright acme corp zeta eta theta iota"),
    (3, "copyright acme corp zeta eta theta kappa"),
    (4, "copyright acme corp solo unique words here"),
    (5, "short doc"),
    (6, "alpha beta gamma delta epsilon zeta eta theta"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_shingle_sid_sets_is_order_isomorphic_bijection(spark):
    """The dictionary encoding must be a bijection on distinct shingles
    whose int order equals the (global df, shingle) lexicographic order
    — the two properties every downstream consumer relies on."""
    from pyspark.sql import functions as F

    from geobuf_cpp_spark.operators.dedup import (
        shingle_sets,
        shingle_sid_sets,
    )

    docs = _docs(spark)
    ds = shingle_sets(docs)
    dsi = shingle_sid_sets(docs)

    # same index shape: one int row per distinct (doc, shingle) row
    assert dsi.count() == ds.count()
    per_doc = dict(
        ds.groupBy("doc_id").count().collect()
    )
    per_doc_i = dict(dsi.groupBy("doc_id").count().collect())
    assert per_doc == per_doc_i

    # bijection + dense 1..K ids
    n_distinct = ds.select("shingle").distinct().count()
    ids = sorted(
        r["shingle"] for r in dsi.select("shingle").distinct().collect()
    )
    assert ids == list(range(1, n_distinct + 1))

    # order isomorphism vs (df, shingle): rebuild the mapping by joining
    # the string index with the id index on doc membership patterns is
    # overkill — check directly that id rank == (df, shingle) rank.
    freq = ds.groupBy("shingle").agg(F.count("*").alias("df"))
    want = [
        r["shingle"]
        for r in freq.orderBy("df", "shingle").collect()
    ]
    # recover string->id by re-running the builder's deterministic
    # definition: the i-th string in (df, shingle) order must get id i+1.
    # shingle_sid_sets does not expose the dictionary, so verify through
    # set reconstruction: docs' id sets sorted ascending must equal the
    # docs' string sets mapped through the (df, shingle) rank.
    rank = {s: i + 1 for i, s in enumerate(want)}
    by_doc_str = {
        r["doc_id"]: sorted(rank[x] for x in r["sh"])
        for r in ds.groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("sh"))
        .collect()
    }
    by_doc_int = {
        r["doc_id"]: sorted(r["sh"])
        for r in dsi.groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("sh"))
        .collect()
    }
    assert by_doc_str == by_doc_int


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_prefix_jaccard_identical_on_sid_index(spark, threshold):
    """prefix_jaccard_pairs over the dictionary-encoded index must equal
    the string-index path pair-for-pair, jaccard included (the int fast
    path skips the freq join and sorts by id alone)."""
    from geobuf_cpp_spark.operators.dedup import (
        prefix_jaccard_pairs,
        shingle_sid_sets,
    )

    docs = _docs(spark)
    a = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_jaccard_pairs(docs, threshold).collect()
    }
    b = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_jaccard_pairs(
            docs, threshold, ds=shingle_sid_sets(docs)
        ).collect()
    }
    assert a == b


def test_ngram_and_containment_identical_on_sid_index(spark):
    from geobuf_cpp_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_containment_pairs,
        shingle_sid_sets,
    )

    docs = _docs(spark)
    dsi = shingle_sid_sets(docs)
    a = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, 0.5).collect()
    }
    b = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, 0.5, ds=dsi).collect()
    }
    assert a == b
    c = {
        (r.id_a, r.id_b, r.i, r.n_a, r.n_b)
        for r in shingle_containment_pairs(docs, 4, 5).collect()
    }
    d = {
        (r.id_a, r.id_b, r.i, r.n_a, r.n_b)
        for r in shingle_containment_pairs(docs, 4, 5, ds=dsi).collect()
    }
    assert c == d


def test_source_quality_ci_no_bigint_wrap_on_large_group(spark):
    """The Wilson-bound intermediate scale^2*(x*(n-x)+n) wraps BIGINT at
    n ~ 6.1e5 docs/source (worst case x = n/2); the decimal(38,0) path
    must return the exact integer parts there. n is synthesized via an
    aggregated frame, not 6e5 real rows: the arithmetic under test is
    the post-aggregation projection."""
    from geobuf_cpp_spark.operators.textstats import source_quality_ci

    # Drive the post-aggregation projection directly with synthesized
    # (n_docs, n_keep) rows (6e5 real docs would be slow), verifying
    # the emitted parts against pure-Python big ints.
    import math

    scale = 10_000
    for n, x in [(700_000, 350_000), (1_000_000, 999_999), (5, 3)]:
        arg = (scale * scale * (x * (n - x) + n)) // n
        root = math.isqrt(arg)
        lb_num = (x + 2) * scale - 2 * root
        lb_den = (n + 4) * scale
        # run the same SQL text the operator emits over a 1-row frame
        row = spark.createDataFrame(
            [(n, x)], "n_docs long, n_keep long")
        from geobuf_cpp_spark.operators.trajectory import sql_isqrt_exact
        arg_sql = (f"((cast({scale} as decimal(38,0)) * {scale}) * "
                   f"(cast(n_keep as decimal(38,0)) * (n_docs - n_keep)"
                   f" + n_docs)) div n_docs")
        out = row.selectExpr(
            f"cast((n_keep + 2) * {scale} - 2 * "
            f"{sql_isqrt_exact(arg_sql)} as bigint) AS lb_num",
            f"cast((n_docs + 4) * cast({scale} as bigint) as bigint) "
            "AS lb_den",
        ).collect()[0]
        assert (out.lb_num, out.lb_den) == (lb_num, lb_den), (n, x)

    # and end-to-end through the operator on a small real corpus the
    # old path also handled — the fix must not move small-group values
    docs = spark.createDataFrame(
        [(i, "src", "clean text " * 30) for i in range(8)],
        "doc_id long, source string, text string")
    out = source_quality_ci(docs).collect()
    assert len(out) == 1 and out[0].n_docs == 8


def test_table_df_memoizes_plan_only_and_respects_sf_switch(spark, tmp_path):
    """table_df caches the lazy reader per (session, dir, table) — same
    object back, no data materialization — and _prep-style re-
    registration after a directory switch must rebind the view to the
    other directory's data."""
    from geobuf_cpp_spark.sources.readers import table_df

    d1 = str(tmp_path / "a"); d2 = str(tmp_path / "b")
    spark.createDataFrame([(1,)], "x long").write.parquet(f"{d1}/t.parquet")
    spark.createDataFrame([(2,)], "x long").write.parquet(f"{d2}/t.parquet")

    df1 = table_df(spark, d1, "t")
    assert table_df(spark, d1, "t") is df1          # memo hit
    assert table_df(spark, d2, "t") is not df1      # keyed by dir

    table_df(spark, d1, "t").createOrReplaceTempView("t")
    assert spark.sql("SELECT x FROM t").collect()[0].x == 1
    table_df(spark, d2, "t").createOrReplaceTempView("t")
    assert spark.sql("SELECT x FROM t").collect()[0].x == 2
    # the memoized frame is a plan, not data: a fresh write to a THIRD
    # dir read through a fresh key still scans storage
    d3 = str(tmp_path / "c")
    spark.createDataFrame([(3,)], "x long").write.parquet(f"{d3}/t.parquet")
    assert table_df(spark, d3, "t").collect()[0].x == 3

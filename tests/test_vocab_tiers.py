"""Value identity of the corpus.py scale tiers (folded back from the
r10 staging module ops/vocab.py) with the corpus.py reference shapes (the r9 verdict item-4 contract: 'tiers pinned
value-identical'), plus the plan properties that ARE the fix."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (0, "the cat sat on the mat the cat", "en"),
        (1, "a b c d e f g a a b", "en"),
        (2, "", "ru"),  # empty doc
        (3, "zzz yyy zzz zzz unique tokens here", "ru"),
        (4, "the the the the", "en"),
        (5, None, "en"),  # null text behaves like empty
        (6, "mixed bag of the cat and zzz", "ru"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_unigram_nll_tiers_value_identical(spark):
    from sdvg_spark.ops.corpus import unigram_nll
    from sdvg_spark.ops.corpus import unigram_nll_tiered

    docs = _docs(spark).select("doc_id", "text")
    kw = dict(top_n=5, alpha=0.5, round_digits=9)
    small = {tuple(r) for r in unigram_nll(docs, "doc_id", "text", **kw).collect()}
    scale = {
        tuple(r)
        for r in unigram_nll_tiered(
            docs, "doc_id", "text", n_docs=7, scale_min_docs=0, **kw
        ).collect()
    }
    assert small == scale and len(small) == 7


def test_unigram_nll_tiered_delegate_path(spark):
    from sdvg_spark.ops.corpus import unigram_nll_tiered

    docs = _docs(spark).select("doc_id", "text")
    # an explicit bound above n_docs routes to the corpus.py delegate
    # (the restructured shape is the default since the r10 A/B —
    # scale_min_docs defaults to 0)
    out = unigram_nll_tiered(
        docs, "doc_id", "text", top_n=3, n_docs=7, scale_min_docs=100
    )
    assert out.count() == 7
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "n_oov", "nll", "ppl",
    ]


def test_unigram_nll_scale_tier_has_no_distinct_aggregate(spark):
    """The sf100 spill driver was the full-stream countDistinct; the
    scale tier must compute V without ANY distinct aggregate."""
    from sdvg_spark.ops.corpus import unigram_nll_tiered

    docs = _docs(spark).select("doc_id", "text")
    plan = unigram_nll_tiered(
        docs, "doc_id", "text", top_n=5, n_docs=7, scale_min_docs=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "distinct" not in plan.lower()


def test_dsir_tiers_value_identical(spark):
    from sdvg_spark.ops.corpus import dsir_logweights
    from sdvg_spark.ops.corpus import dsir_logweights_tiered

    d = _docs(spark)
    docs = d.select("doc_id", "text")
    target = d.where(F.col("lang") == "en").select("doc_id", "text")
    kw = dict(buckets=16, alpha=0.5, round_digits=9)
    small = {tuple(r) for r in dsir_logweights(docs, target, "doc_id", "text", **kw).collect()}
    scale = {
        tuple(r)
        for r in dsir_logweights_tiered(
            docs, target, "doc_id", "text", n_docs=7, scale_min_docs=0, **kw
        ).collect()
    }
    assert small == scale and len(small) == 7


def test_dsir_scale_tier_scored_stage_is_map_only(spark):
    """The fix: after the two ≤buckets-row aggregates, the scored query
    is ONE pass — no exchange anywhere in its plan (the small tier
    shuffles every (doc, token) row into a collect_list buffer, the
    entire 18.6 GB sf100 spill)."""
    from sdvg_spark.ops.corpus import dsir_logweights_tiered

    d = _docs(spark)
    out = dsir_logweights_tiered(
        d.select("doc_id", "text"),
        d.where(F.col("lang") == "en").select("doc_id", "text"),
        "doc_id",
        "text",
        buckets=16,
        n_docs=7,
        scale_min_docs=0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan  # pure codegen/HOF expressions


def test_rle_postings_match_exploded_counts(spark):
    from sdvg_spark.ops.text import rle_postings
    from sdvg_spark.ops.text import tokens

    docs = _docs(spark).select("doc_id", "text")
    got = {
        (r.doc_id, r.token): r.tf
        for r in rle_postings(docs, "doc_id", "text").collect()
    }
    want = {
        (r.doc_id, r.token): r.tf
        for r in docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .collect()
    }
    assert got == want and len(want) > 0


def test_unigram_nll_scored_folds_value_identical(spark):
    """r10 late addition: the in-row Arrow fold (scored_fold='inrow',
    the default — map-only scored stage) must be bit-identical to BOTH
    the window formulation and the corpus.py collect_list fold,
    including empty/null/whitespace docs, unicode tokens, and a
    single-token vocab cut."""
    from sdvg_spark.ops.corpus import unigram_nll
    from sdvg_spark.ops.corpus import unigram_nll_tiered

    rows = [
        (0, "the cat sat on the mat the cat"),
        (1, ""),
        (2, None),
        (3, "   "),
        (4, "über cafè 猫 the the über"),
        (5, "single"),
        (6, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for top_n in (1, 3, 1000):
        kw = dict(top_n=top_n, alpha=0.5, round_digits=9)
        inrow = sorted(
            tuple(r)
            for r in unigram_nll_tiered(
                docs, "doc_id", "text", scored_fold="inrow", **kw
            ).collect()
        )
        window = sorted(
            tuple(r)
            for r in unigram_nll_tiered(
                docs, "doc_id", "text", scored_fold="window", **kw
            ).collect()
        )
        small = sorted(
            tuple(r) for r in unigram_nll(docs, "doc_id", "text", **kw).collect()
        )
        assert inrow == window == small and len(inrow) == 7, top_n


def test_unigram_nll_inrow_scored_stage_is_map_only(spark):
    """The residual-spill fix (SHUFFLE_r10 probe #3 localized the
    7.0 GB to the window input's shuffle-write sort): the in-row
    scored query plan has NO exchange and carries the Arrow kernel."""
    from sdvg_spark.ops.corpus import unigram_nll_tiered

    docs = _docs(spark).select("doc_id", "text")
    out = unigram_nll_tiered(
        docs, "doc_id", "text", top_n=5, scored_fold="inrow"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInArrow" in plan


def test_unigram_nll_inrow_vocab_cap_falls_back_to_window(spark, monkeypatch):
    """Past _INROW_MAX_VOCAB broadcast entries the scored stage must
    route to the shuffle-based window formulation (same values)."""
    import sdvg_spark.ops.corpus as V

    docs = _docs(spark).select("doc_id", "text")
    monkeypatch.setattr(V, "_INROW_MAX_VOCAB", 2)
    capped = V.unigram_nll_tiered(
        docs, "doc_id", "text", top_n=1000, scored_fold="inrow"
    )
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan  # fell back
    monkeypatch.setattr(V, "_INROW_MAX_VOCAB", 2_000_000)
    uncapped = V.unigram_nll_tiered(
        docs, "doc_id", "text", top_n=1000, scored_fold="inrow"
    )
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )


def test_unigram_nll_scored_folds_identical_on_random_corpus(spark):
    """Seeded random corpus (mixed lengths, repeats, unicode, blank and
    null docs) — one generation, all three fold shapes bit-identical.
    Broader than the fixed edge-case list; deterministic (seed 1234)."""
    import random

    from sdvg_spark.ops.corpus import unigram_nll
    from sdvg_spark.ops.corpus import unigram_nll_tiered

    rng = random.Random(1234)
    alphabet = ["the", "cat", "zzz", "a", "ü", "猫", "x1", "q-q", "longtoken" * 3]
    rows = []
    for i in range(200):
        mode = rng.random()
        if mode < 0.05:
            rows.append((i, None))
        elif mode < 0.10:
            rows.append((i, "   " * rng.randint(1, 3)))
        else:
            k = rng.randint(1, 40)
            rows.append(
                (i, " ".join(rng.choice(alphabet) for _ in range(k)))
            )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(top_n=4, alpha=0.5, round_digits=9)
    outs = [
        sorted(
            tuple(r)
            for r in unigram_nll_tiered(
                docs, "doc_id", "text", scored_fold=fold, **kw
            ).collect()
        )
        for fold in ("inrow", "window")
    ]
    outs.append(
        sorted(tuple(r) for r in unigram_nll(docs, "doc_id", "text", **kw).collect())
    )
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) == 200

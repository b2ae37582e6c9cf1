"""Units for llm/sampling.py: deterministic hash sampling, exact
stratified quotas, and weighted mixture resampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_api_pipeline_spark.llm.sampling import (
    hash_sample,
    mixture_rates,
    mixture_sample,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("es"), F.lit("fr"), F.lit("zh")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_hash_sample_deterministic_and_stable_under_repartition(spark):
    df = _docs(spark)
    a = sorted(r.doc_id for r in hash_sample(df, 0.25, seed=1).collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(df.repartition(13), 0.25, seed=1).collect()
    )
    assert a == b and 0 < len(a) < 400
    # ~25% within binomial noise (n=400, p=.25 → sd ≈ 8.7).
    assert 60 <= len(a) <= 140


def test_hash_sample_seeds_are_independent(spark):
    df = _docs(spark)
    s0 = {r.doc_id for r in hash_sample(df, 0.5, seed=0).collect()}
    s1 = {r.doc_id for r in hash_sample(df, 0.5, seed=1).collect()}
    assert s0 != s1
    # Nesting: fraction 0.2 sample is a subset of fraction 0.5 at the
    # same seed (thresholds nest by construction).
    small = {r.doc_id for r in hash_sample(df, 0.2, seed=0).collect()}
    assert small <= s0


def test_hash_sample_fraction_bounds(spark):
    df = _docs(spark)
    assert hash_sample(df, 0.0).count() == 0
    assert hash_sample(df, 1.0).count() == 400
    with pytest.raises(ValueError):
        hash_sample(df, 1.5)


def test_stratified_sample_exact_quota(spark):
    df = _docs(spark)  # 100 per lang
    out = stratified_sample(df, "lang", 30, seed=2)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 30, "es": 30, "fr": 30, "zh": 30}
    # Undersized stratum keeps everything it has.
    tiny = df.filter((F.col("lang") != "zh") | (F.col("doc_id") < 40))
    out2 = stratified_sample(tiny, "lang", 30, seed=2)
    n_zh = out2.filter(F.col("lang") == "zh").count()
    assert n_zh == 10  # only 10 zh rows exist (ids 3,7,..,39)


def test_mixture_rates_hand_computed(spark):
    df = _docs(spark)  # 100 per lang
    rates = {
        r.lang: r
        for r in mixture_rates(
            df, "lang", {"en": 0.6, "es": 0.4}, total=100
        ).collect()
    }
    assert set(rates) == {"en", "es"}
    assert rates["en"].n_rows == 100 and rates["en"].target_n == 60.0
    assert abs(rates["en"].rate - 0.6) < 1e-12
    assert abs(rates["es"].rate - 0.4) < 1e-12
    # Target above stratum size caps at rate 1.0.
    capped = {
        r.lang: r.rate
        for r in mixture_rates(
            df, "lang", {"en": 1.0}, total=500
        ).collect()
    }
    assert capped["en"] == 1.0


def test_mixture_sample_hits_targets_and_drops_unlisted(spark):
    df = _docs(spark)
    out = mixture_sample(
        df, "lang", {"en": 0.5, "es": 0.5}, total=120, seed=4
    )
    rows = out.collect()
    langs = {r.lang for r in rows}
    assert langs <= {"en", "es"}  # fr/zh dropped
    # Binomial around 60 per stratum (sd ≈ 4.9 at p=.6, n=100).
    n_en = sum(1 for r in rows if r.lang == "en")
    n_es = sum(1 for r in rows if r.lang == "es")
    assert 40 <= n_en <= 80 and 40 <= n_es <= 80


def test_mixture_sample_deterministic(spark):
    df = _docs(spark)
    w = {"en": 0.7, "fr": 0.3}
    a = sorted(
        r.doc_id
        for r in mixture_sample(df, "lang", w, 80, seed=9).collect()
    )
    b = sorted(
        r.doc_id
        for r in mixture_sample(
            df.repartition(7), "lang", w, 80, seed=9
        ).collect()
    )
    assert a == b


def test_assign_shards_stable_under_reordering(spark):
    from pos_api_pipeline_spark.llm.sampling import assign_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    a = {r.doc_id: r.shard for r in assign_shards(df, 8).collect()}
    b = {
        r.doc_id: r.shard
        for r in assign_shards(df.orderBy(F.desc("doc_id")), 8).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))  # 100 keys hit all 8 shards


def test_assign_shards_in_range_and_deterministic_vs_md5(spark):
    import hashlib

    from pos_api_pipeline_spark.llm.sampling import assign_shards

    df = spark.createDataFrame([(7,), (42,)], "doc_id long")
    got = {r.doc_id: r.shard for r in assign_shards(df, 16).collect()}
    for k, shard in got.items():
        expect = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 16
        assert shard == expect


def test_select_by_token_budget_equals_global_greedy(spark):
    from pos_api_pipeline_spark.llm.sampling import select_by_token_budget
    from pyspark.sql import functions as F

    # Deterministic scores spread across bins; token sizes vary.
    rows = [
        (i, ((i * 37) % 100) / 100.0 - 0.5, 10 + (i * 13) % 40)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    budget = 1500
    got = {
        r.doc_id
        for r in select_by_token_budget(
            df, budget, "score", "n_tokens", n_bins=16,
            score_lo=-0.5, score_hi=0.5,
        ).collect()
    }
    # Brute-force reference: maximal prefix in (score desc, id) order.
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    want, cum = set(), 0
    for i, s, n in ordered:
        if cum + n > budget:
            break
        cum += n
        want.add(i)
    assert got == want and got  # nonempty, exact


def _greedy_reference(rows, budget):
    """Maximal prefix in (score desc, id asc) order."""
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    want, cum = set(), 0
    for i, s, n in ordered:
        if cum + n > budget:
            break
        cum += n
        want.add(i)
    return want


def test_select_by_token_budget_refines_concentrated_scores(spark):
    from pos_api_pipeline_spark.llm.sampling import select_by_token_budget

    # Every score inside ONE of the 16 coarse bins — the r6 watch
    # item's degradation case. max_edge_rows=10 forces refinement;
    # the refined sub-bins must still reproduce the global greedy.
    rows = [
        (i, 0.25 + ((i * 37) % 100) / 10_000.0, 10 + (i * 13) % 40)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long"
    )
    budget = 1500
    got = {
        r.doc_id
        for r in select_by_token_budget(
            df, budget, "score", "n_tokens", n_bins=16,
            score_lo=-0.5, score_hi=0.5, max_edge_rows=10,
        ).collect()
    }
    want = _greedy_reference(rows, budget)
    assert got == want and got


def test_select_by_token_budget_pure_tie_refines_on_id(spark):
    from pos_api_pipeline_spark.llm.sampling import select_by_token_budget

    # All scores IDENTICAL: score refinement can never split the
    # boundary bin, so the id axis takes over (order inside a tie is
    # id asc). Non-contiguous ids exercise the id-range binning.
    rows = [(i * 7 + 3, 0.125, 10 + i % 5) for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long"
    )
    budget = 777
    got = {
        r.doc_id
        for r in select_by_token_budget(
            df, budget, "score", "n_tokens", n_bins=8,
            score_lo=0.0, score_hi=1.0, max_edge_rows=20,
        ).collect()
    }
    want = _greedy_reference(rows, budget)
    assert got == want and got


def test_select_by_token_budget_ids_above_2p53_still_refine(spark):
    from pos_api_pipeline_spark.llm.sampling import select_by_token_budget

    # Long ids above 2^53 with ALL scores tied: the old double-cast
    # id bins collapsed adjacent ids to equal doubles (_ilo == _ihi
    # at fine ranges → refinement silently stopped, max_edge_rows
    # unhonored). The integral-id path bins with long DIV arithmetic
    # — exact at any magnitude — so the greedy prefix must still be
    # exact AND refinement must be able to split single-double spans.
    base = (1 << 60) + 11  # far past double's 2^53 integer range
    rows = [(base + i * 3, 0.25, 10 + i % 7) for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long"
    )
    budget = 888
    got = {
        r.doc_id
        for r in select_by_token_budget(
            df, budget, "score", "n_tokens", n_bins=8,
            score_lo=0.0, score_hi=1.0, max_edge_rows=20,
        ).collect()
    }
    want = _greedy_reference(rows, budget)
    assert got == want and got


def test_select_by_token_budget_decimal_scale0_ids_exact(spark):
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pos_api_pipeline_spark.llm.sampling import select_by_token_budget

    # DECIMAL(18, 0) ids (the shape bigint JDBC sources commonly
    # deliver) are integral in practice: they must take the exact
    # long-DIV binning path, not the double path whose >2^53 collapse
    # the integral route exists to avoid (r11, ADVICE). Ids sit past
    # 2^53 so a silent double round-trip would break the greedy
    # prefix.
    base = (1 << 55) + 7
    rows = [(Decimal(base + i * 3), 0.25, 10 + i % 7) for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id decimal(18,0), score double, n_tokens long"
    )
    budget = 888
    got = {
        int(r.doc_id)
        for r in select_by_token_budget(
            df, budget, "score", "n_tokens", n_bins=8,
            score_lo=0.0, score_hi=1.0, max_edge_rows=20,
        ).collect()
    }
    want = _greedy_reference(
        [(int(i), s, t) for i, s, t in rows], budget
    )
    assert got == want and got


def test_select_by_token_budget_string_ids_tie_fallback(spark):
    from pos_api_pipeline_spark.llm.sampling import select_by_token_budget

    # Non-numeric ids + a score tie: the id axis is unavailable, the
    # window falls back to the smallest refined set — results must
    # still be exact (and nothing may throw on the string cast).
    rows = [(f"doc-{i:04d}", 0.5, 10) for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id string, score double, n_tokens long"
    )
    got = {
        r.doc_id
        for r in select_by_token_budget(
            df, 105, "score", "n_tokens", n_bins=4,
            score_lo=0.0, score_hi=1.0, max_edge_rows=5,
        ).collect()
    }
    want = {f"doc-{i:04d}" for i in range(10)}  # 10 × 10 tokens
    assert got == want


def test_select_by_token_budget_whole_corpus_fits(spark):
    from pos_api_pipeline_spark.llm.sampling import select_by_token_budget

    df = spark.createDataFrame(
        [(0, 0.1, 5), (1, -0.2, 5)], "doc_id long, score double, n_tokens long"
    )
    out = select_by_token_budget(df, 1000, "score", "n_tokens")
    assert out.count() == 2


def test_weighted_sample_without_replacement_properties(spark):
    from pos_api_pipeline_spark.llm.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [(i, "g" if i % 2 else "h", float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    out = weighted_sample_without_replacement(
        df, k=10, weight_col="w", strata_col="grp"
    ).collect()
    # exactly k per stratum, no duplicates, deterministic across reruns
    by_g = {}
    for r in out:
        by_g.setdefault(r.grp, []).append(r.doc_id)
    assert sorted(len(v) for v in by_g.values()) == [10, 10]
    assert all(len(set(v)) == len(v) for v in by_g.values())
    again = weighted_sample_without_replacement(
        df, k=10, weight_col="w", strata_col="grp"
    ).collect()
    assert sorted((r.grp, r.doc_id) for r in again) == sorted(
        (r.grp, r.doc_id) for r in out
    )
    # a different seed gives a different sample
    other = weighted_sample_without_replacement(
        df, k=10, weight_col="w", strata_col="grp", seed=7
    ).collect()
    assert sorted((r.grp, r.doc_id) for r in other) != sorted(
        (r.grp, r.doc_id) for r in out
    )
    # zero/negative/null weights never selected
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 5.0), (5, 1.0)],
        "doc_id long, w double",
    )
    got = {
        r.doc_id
        for r in weighted_sample_without_replacement(
            df2, k=10, weight_col="w"
        ).collect()
    }
    assert got == {4, 5}


def test_weighted_sample_heavier_weights_win_on_average(spark):
    from pos_api_pipeline_spark.llm.sampling import (
        weighted_sample_without_replacement,
    )

    # weight 100 vs 1: the heavy half should dominate the sample.
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy = 0
    for seed in range(5):
        out = weighted_sample_without_replacement(
            df, k=20, weight_col="w", seed=seed
        ).collect()
        heavy += sum(1 for r in out if r.doc_id < 50)
    assert heavy / (5 * 20) > 0.8


def test_dsir_weights_prefer_target_like_docs(spark):
    from pos_api_pipeline_spark.llm.sampling import (
        dsir_log_weights,
        dsir_resample,
    )

    # target speaks "alpha"; raw pool has alpha-like and beta-like docs
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota"),
         (3, "alpha gamma epsilon beta"), (4, "kappa lambda mu nu"),
         (5, "")],
        "doc_id long, text string",
    )
    w = {r.doc_id: r for r in dsir_log_weights(raw, target).collect()}
    assert len(w) == 5
    # target-vocabulary docs outweigh off-distribution docs
    assert w[1].log_weight > w[2].log_weight
    assert w[3].log_weight > w[4].log_weight
    # empty doc: no tokens, null weight
    assert w[5].n_tokens == 0 and w[5].log_weight is None

    sel = dsir_resample(raw, target, k=2).collect()
    assert len(sel) == 2
    assert all(r.doc_id != 5 for r in sel)  # null weight never selected
    # deterministic: rerun selects the identical rows
    again = dsir_resample(raw, target, k=2).collect()
    assert [r.doc_id for r in sel] == [r.doc_id for r in again]


def test_temperature_mixture_upsamples_tail(spark):
    from pos_api_pipeline_spark.llm.sampling import temperature_mixture_rates

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = {r.src: r for r in
           temperature_mixture_rates(df, "src", total=500, alpha=0.5).collect()}
    # alpha<1 shifts mass toward the tail: small's target share beats
    # its raw share, big's shrinks
    assert out["small"].target_n / 500 > out["small"].share
    assert out["big"].target_n / 500 < out["big"].share
    # alpha=1 is proportional
    prop = {r.src: r for r in
            temperature_mixture_rates(df, "src", total=500, alpha=1.0).collect()}
    assert abs(prop["big"].target_n - 450.0) < 1e-6
    assert abs(prop["small"].target_n - 50.0) < 1e-6
    # rate is capped at 1.0
    assert all(r.rate <= 1.0 for r in out.values())

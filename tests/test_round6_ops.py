"""Structural invariants of the round-6 operators (q83-q95) beyond the
per-query DuckDB oracle equality (test_queries covers that): these pin
the SEMANTIC contracts — rank contiguity, partition-of-members
arithmetic, range-join equivalence against a brute force — that an
oracle string shared with the implementation could not falsify on its
own."""

from __future__ import annotations

import pyspark.sql.functions as F

from smartbulkcopy_spark.queries import REGISTRY

from .conftest import SF_SMOKE


def _run(name, spark):
    return REGISTRY[name].fn(spark, SF_SMOKE).toPandas()


def test_q83_ranks_contiguous_and_sorted(spark):
    df = _run("q83_cluster_pruned_sample", spark)
    for cid, g in df.groupby("cid"):
        ranks = sorted(g["rnk"])
        assert ranks == list(range(1, len(g) + 1))
        # keep-list is the closest prefix: d2 non-decreasing with rank
        ordered = g.sort_values("rnk")["d2"].tolist()
        assert ordered == sorted(ordered)


def test_q84_temperature_flattens_shares(spark):
    df = _run("q84_mixture_weights", spark)
    assert df["prop_ppm"].sum() <= 1_000_000
    assert df["temp_ppm"].sum() <= 1_000_000
    # alpha=0.5 compresses the mixture: the biggest domain loses share,
    # the smallest gains (equality only in the all-uniform corner)
    big = df.loc[df["n_docs"].idxmax()]
    small = df.loc[df["n_docs"].idxmin()]
    assert big["temp_ppm"] <= big["prop_ppm"]
    assert small["temp_ppm"] >= small["prop_ppm"]


def test_q85_oov_bounds(spark):
    df = _run("q85_oov_rate", spark)
    assert (df["n_oov"] <= df["n_tokens"]).all()
    assert df["oov_permille"].between(0, 1000).all()


def test_q86_member_arithmetic(spark):
    df = _run("q86_split_leakage_audit", spark)
    assert (
        df["n_train"] + df["n_val"] + df["n_test"] == df["n_members"]
    ).all()
    nz = (
        (df[["n_train", "n_val", "n_test"]] > 0).sum(axis=1)
    )
    assert (df["n_splits"] == nz).all()
    assert (df["leaky"] == (df["n_splits"] > 1)).all()


def test_q88_strictly_prior_attribution(spark):
    df = _run("q88_asof_last_touch", spark)
    with_click = df[df["click_event_id"].notna()]
    assert (with_click["gap_us"] > 0).all()
    assert df[df["click_event_id"].isna()]["gap_us"].isna().all()


def test_q88_same_microsecond_click_does_not_mask_earlier(
    spark, tmp_path
):
    """A purchase with BOTH a co-timestamped click and a strictly-earlier
    click must attribute to the earlier click (merge_asof
    allow_exact_matches=False), not get NULL because the co-timestamped
    click shadowed it in the window frame; ties among earlier clicks go
    to the max event_id. Runs the registered builder AND its DuckDB
    oracle on the synthetic corner so both spellings are pinned."""
    import duckdb
    import pandas as pd

    base = pd.Timestamp("2024-01-01 00:00:00")
    us = pd.Timedelta(microseconds=1)
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6, 7],
            "ts": [
                base,  # u1 click (earlier)
                base + 5 * us,  # u1 click (co-timestamped w/ purchase)
                base + 5 * us,  # u1 purchase -> must attribute to e1
                base,  # u2 purchase, no prior click -> NULL
                base + 2 * us,  # u3 click tie a
                base + 2 * us,  # u3 click tie b (max event_id wins)
                base + 9 * us,  # u3 purchase -> e6, gap 7
            ],
            "user_id": [1, 1, 1, 2, 3, 3, 3],
            "event_type": [
                "click", "click", "purchase", "purchase",
                "click", "click", "purchase",
            ],
            "value": [0.0] * 7,
            "props": ["{}"] * 7,
        }
    )
    d = tmp_path / "sf_q88"
    d.mkdir()
    ev.to_parquet(d / "events.parquet", index=False)

    got = (
        REGISTRY["q88_asof_last_touch"].fn(spark, str(d))
        .toPandas()
        .set_index("event_id")
    )
    assert got.loc[3, "click_event_id"] == 1
    assert got.loc[3, "gap_us"] == 5
    assert pd.isna(got.loc[4, "click_event_id"])
    assert got.loc[7, "click_event_id"] == 6
    assert got.loc[7, "gap_us"] == 7

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{d / 'events.parquet'}')"
    )
    odf = (
        con.execute(REGISTRY["q88_asof_last_touch"].oracle)
        .df()
        .set_index("event_id")
    )
    assert odf.loc[3, "click_event_id"] == 1
    assert odf.loc[7, "click_event_id"] == 6
    assert pd.isna(odf.loc[4, "click_event_id"])


def test_q89_stages_partition_ranked_corpus(spark):
    df = _run("q89_curriculum_stages", spark).sort_values("stage")
    from smartbulkcopy_spark.queries import table

    n = table(spark, SF_SMOKE, "documents").count()
    assert df["n_docs"].sum() == n
    assert df["stage"].tolist() == list(range(1, len(df) + 1))
    # rank order: every score in stage s+1 >= every score in stage s
    maxes = df["max_score"].tolist()
    mins = df["min_score"].tolist()
    for prev_max, next_min in zip(maxes, mins[1:]):
        assert next_min >= prev_max
    assert df["n_docs"].max() - df["n_docs"].min() <= 1


def test_q90_cumulative_closes_at_one(spark):
    df = _run("q90_seqlen_histogram", spark).sort_values("bucket")
    assert (df["bucket"] & (df["bucket"] - 1) == 0).all()  # powers of 2
    assert df["cum_docs"].is_monotonic_increasing
    assert df["cum_ppm"].iloc[-1] == 1_000_000


def test_q91_pair_counts_dominate_doc_counts(spark):
    df = _run("q91_bpe_merge_candidates", spark)
    assert (df["tf"] >= df["df"]).all()
    assert df["tf"].is_monotonic_decreasing


def test_q92_shards_cover_corpus(spark):
    df = _run("q92_shard_balance", spark)
    from smartbulkcopy_spark.queries import table

    assert df["n_docs"].sum() == table(spark, SF_SMOKE, "documents").count()
    assert df["shard"].between(0, 31).all()
    assert df["bytes_ppm"].sum() <= 1_000_000


def test_q93_covers_exactly_the_batch(spark):
    df = _run("q93_incremental_ann_ingest", spark)
    from smartbulkcopy_spark.queries import table

    emb = table(spark, SF_SMOKE, "embeddings")
    n_batch = emb.where(F.col("vec_id") % 10 == 7).count()
    assert len(df) == n_batch
    assert (df["is_present"] == (df["n_similar"] > 0)).all()


def test_q94_every_pair_has_a_detector(spark):
    df = _run("q94_ensemble_dedup", spark)
    assert (df["lexical"] | df["semantic"]).all()
    assert (df["a_id"] < df["b_id"]).all()


def test_q95_equals_bruteforce_interval_join(spark):
    """The bucketed range join must equal the naive per-pair scan —
    computed here in plain Python over the (small) smoke fixture."""
    from smartbulkcopy_spark.queries import _EV_MICROS, table

    ev = (
        table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "event_type", F.expr(_EV_MICROS).alias("t"))
        .toPandas()
    )
    errors = ev[ev["event_type"] == "error"]
    clicks = ev[ev["event_type"] == "click"]
    by_user = {u: sorted(g["t"]) for u, g in clicks.groupby("user_id")}
    expect = {}
    for r in errors.itertuples(index=False):
        ts = by_user.get(r.user_id, [])
        expect[r.event_id] = sum(
            1 for t in ts if r.t < t <= r.t + 600_000_000
        )
    df = _run("q95_interval_click_attribution", spark)
    got = dict(zip(df["event_id"], df["n_clicks"]))
    assert got == expect


def test_q96_one_row_per_source_with_share(spark):
    df = _run("q96_template_prefix_detection", spark)
    assert df["source"].is_unique
    assert (df["share_ppm"] > 0).all()
    assert (df["share_ppm"] <= 1_000_000).all()
    # the reported prefix never exceeds 8 tokens
    assert (df["prefix"].str.split(" ").str.len() <= 8).all()


def test_q97_pair_support_bounds(spark):
    df = _run("q97_token_cooccurrence", spark)
    assert (df["t1"] < df["t2"]).all()
    # co-occurrence support can't exceed either marginal
    assert (df["n_ab"] <= df[["n_a", "n_b"]].min(axis=1)).all()
    assert df["n_ab"].is_monotonic_decreasing


def test_q98_shares_close_per_split(spark):
    df = _run("q98_split_label_balance", spark)
    from smartbulkcopy_spark.queries import table

    assert df["n_vecs"].sum() == table(spark, SF_SMOKE, "embeddings").count()
    for split, g in df.groupby("split"):
        # floor-ppm shares sum to within |labels| ulps of exactly 1e6
        assert 1_000_000 - len(g) < g["label_ppm"].sum() <= 1_000_000


def test_q99_stopword_bounds(spark):
    df = _run("q99_stopword_ratio", spark)
    assert (df["n_stop"] <= df["n_tokens"]).all()
    assert df["stop_permille"].between(0, 1000).all()
    # marker-injected synthetic prose: stopwords do occur
    assert df["n_stop"].sum() > 0


def test_q100_pass_flag_consistent(spark):
    df = _run("q100_gopher_rules", spark)
    recomputed = (
        df["n_tokens"].between(20, 100_000)
        & df["mean_wordlen_e2"].between(300, 1000)
        & (df["alpha_pct"] >= 70)
    )
    assert (df["passes"] == recomputed).all()


def test_q101_cohort_triangle(spark):
    df = _run("q101_hourly_cohort_retention", spark)
    assert (df["offset_h"] >= 0).all()
    # offset 0 contains every user of the cohort (first activity is
    # activity), so it is each cohort's maximal cell
    for _, g in df.groupby("cohort_hr"):
        peak = g.loc[g["offset_h"].idxmin()]
        assert peak["offset_h"] == 0
        assert peak["n_users"] == g["n_users"].max()


def test_q102_curve_monotone(spark):
    df = _run("q102_conversion_latency", spark).sort_values("gap_min")
    assert df["cum_users"].is_monotonic_increasing
    assert df["conv_cum_ppm"].is_monotonic_increasing
    assert df["conv_cum_ppm"].iloc[-1] <= 1_000_000
    assert df["cum_users"].iloc[-1] == df["n_users"].sum()


def test_q103_drift_is_abs_delta(spark):
    df = _run("q103_embedding_drift", spark)
    assert len(df) == 64
    assert (
        df["drift_e6"] == (df["mean_idx_e6"] - df["mean_bat_e6"]).abs()
    ).all()


def test_q104_roundtrip_matches_parquet_source(spark):
    """The ORC hop must preserve the corpus: the aggregate computed over
    the round-tripped data equals the same aggregate straight off the
    parquet source."""
    import pyspark.sql.functions as FF

    from smartbulkcopy_spark.queries import table

    df = _run("q104_orc_corpus_roundtrip", spark)
    src = (
        table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .agg(
            FF.count("*").alias("n_docs"),
            FF.sum("n_chars").alias("total_chars"),
            FF.sum(
                FF.conv(FF.substring(FF.md5("text"), 1, 8), 16, 10).cast(
                    "long"
                )
            ).alias("content_checksum"),
        )
        .orderBy("lang")
        .toPandas()
    )
    assert df.reset_index(drop=True).equals(src.reset_index(drop=True))


def test_q105_funnel_monotone_and_consistent(spark):
    df = _run("q105_curation_funnel", spark).sort_values("stage_id")
    assert df["stage"].tolist() == [
        "raw", "token_min", "mixture", "exact_dedup", "near_dup",
    ]
    surv = df["n_surviving"].tolist()
    assert surv == sorted(surv, reverse=True)  # stages only ever drop
    drops = df["n_dropped"].tolist()
    assert drops[0] == 0
    for i in range(1, len(surv)):
        assert drops[i] == surv[i - 1] - surv[i]
    # the funnel's terminal count equals the composed q61 corpus
    from smartbulkcopy_spark.pipeline.curate import curated_docs

    assert surv[-1] == curated_docs(spark, SF_SMOKE).count()


def test_q106_provenance_covers_exactly_the_dropped(spark):
    df = _run("q106_dedup_provenance", spark)
    from smartbulkcopy_spark.queries import REGISTRY, table

    kept = {
        r["doc_id"]
        for r in REGISTRY["q34_near_dup_dedup"].fn(spark, SF_SMOKE).collect()
    }
    all_ids = {
        r["doc_id"]
        for r in table(spark, SF_SMOKE, "documents").select("doc_id").collect()
    }
    assert set(df["dropped_doc_id"]) == all_ids - kept
    assert df["dropped_doc_id"].is_unique
    assert (df["j_millis"] >= 500).all()


def test_q107_estimator_bounds(spark):
    df = _run("q107_minhash_estimate_quality", spark)
    assert df["est_millis"].between(0, 1000).all()
    assert df["j_millis"].between(0, 1000).all()
    assert (
        df["abs_err_millis"] == (df["j_millis"] - df["est_millis"]).abs()
    ).all()
    # est quantizes to eighths
    assert (df["est_millis"] % 125 == 0).all()


def test_q108_deciles_cover_all_candidates(spark):
    df = _run("q108_jaccard_distribution", spark)
    from smartbulkcopy_spark.pipeline.dedup import candidate_pairs

    assert df["n_pairs"].sum() == candidate_pairs(spark, SF_SMOKE).count()
    assert (df["min_j_millis"] >= df["decile"] * 100).all()
    assert (df["max_j_millis"] < (df["decile"] + 1) * 100).all()


def test_q109_rows_conserve_events(spark):
    df = _run("q109_event_transitions", spark)
    from smartbulkcopy_spark.queries import table

    n_events = table(spark, SF_SMOKE, "events").count()
    assert df["n_transitions"].sum() == n_events  # one row per event
    for _, g in df.groupby("prev_type"):
        assert 1_000_000 - len(g) < g["prob_ppm"].sum() <= 1_000_000


def test_q110_ahash_bit_accounting(spark):
    df = _run("q110_image_ahash", spark)
    assert df["ahash_hi"].between(0, 2**32 - 1).all()
    assert df["ahash_lo"].between(0, 2**32 - 1).all()
    # n_set equals the popcount of the two halves, and strictly-above-
    # mean bits can never be all 64
    pop = df["ahash_hi"].map(lambda v: bin(int(v)).count("1")) + df[
        "ahash_lo"
    ].map(lambda v: bin(int(v)).count("1"))
    assert (df["n_set"] == pop).all()
    assert (df["n_set"] < 64).all()

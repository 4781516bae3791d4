"""Regenerate PLANS.md: the formatted physical plans of the headline
queries, with the scale-relevant properties called out. Run from the repo
root: python tools/dump_plans.py"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ANNOTATED = {
    "q01_scan_project": "Column pruning: ReadSchema carries only the 3"
    " projected columns; no sort, no shuffle.",
    "q03_range_partition_predicate": "Predicate pushdown: the shipdate"
    " range lands in PushedFilters at the parquet scan.",
    "q09_inner_join_agg": "Dimension join: nation is BroadcastHashJoin —"
    " no shuffle of the fact side.",
    "q17_agg_sweep": "Partial aggregation (partial_sum) before the"
    " exchange: only (group, partial) rows shuffle.",
    "q27_minhash_lsh_pairs": "LSH banding: signature fold is row-local;"
    " the only wide operation is the self-join on the 8-byte integer band key.",
    "q30_cosine_topk": "Exact ANN baseline: fold dot product in the scan"
    " stage, TakeOrderedAndProject — no global sort.",
    "q31_lsh_bucket_histogram": "Row-local bucket signature; only"
    " (bucket, count) pairs shuffle.",
    "q33_embedding_near_dup": "Bucket-restricted near-dup: vectors"
    " shuffle once on the 1-byte bucket key; cosine only in-bucket.",
    "q51_pack_offsets": "Two-phase cumulative sum: the corpus-sized"
    " shuffle is keyed by block_id (parallel windows); the only"
    " SinglePartition exchange carries the per-block TOTALS (8 rows"
    " here, #docs/PACK_BLOCK in general), broadcast-joined back.",
    "q52_tfidf_top_terms": "tf and df are partial-aggregated groupBys;"
    " the tf⋈df join is keyed by token; the ranking window partitions"
    " by doc_id so groups are document-sized.",
    "q55_embedding_dim_stats": "Floats floor-scaled to ints per row"
    " (posexplode, row-local), then associative integer sums — the"
    " shuffle carries (dim, partial sums), EMBED_DIM groups.",
    "q29_ngram_jaccard": "Verify-stage thinning: the candidate id set"
    " (persisted, tiny) LEFT-SEMI filters the corpus BEFORE shingle"
    " sets are built — exact n-gram sets exist only for candidate"
    " members, never the whole corpus.",
    "q61_curation_stats": "The assembled curation pipeline:"
    " row-local token/mixture filters before the id-only semi/anti"
    " joins; the wide stages are exactly the component operators'"
    " (content-hash groupBy, banded LSH, final split rollup); the one"
    " materialization is the candidate id set feeding the thinned"
    " verify stage.",
    "q63_incremental_dedup": "Batch-vs-index dedup: the new batch joins"
    " the corpus's banded index on the 8-byte integer band key (hot index"
    " bands filtered before the join); exact-Jaccard verify touches"
    " only cross-side candidates.",
    "q69_dedup_clusters": "Iterative hash-min connected components: the"
    " dumped plan is the FINAL label table (post-fixpoint) — each round"
    " was one (id, label) join + min-agg, localCheckpointed, so the"
    " lineage here is one round deep, not one-per-round.",
    "q71_trigram_novelty": "Two-pass learn-then-score: the top-V model"
    " is TakeOrdered over partial-aggregated counts and re-enters as a"
    " BroadcastExchange; the scoring join never shuffles the exploded"
    " trigrams.",
    "q72_salted_skew_join": "Manual skew salting: ShuffledHashJoin keyed"
    " (user_id, salt) — the hot key spans SALT_R reducer tasks; the"
    " dimension side shows the salt-sequence explode (R-fold"
    " replication), and no broadcast anywhere.",
    "q74_embedding_quantize": "Learn-then-apply quantization: 64-group"
    " scale aggregation re-enters as a BroadcastExchange onto the"
    " element stream; per-vector rollup is partial-aggregated integer"
    " checksums.",
    "q76_stratified_split_audit": "Quantile windows run over HISTOGRAM"
    " rows ((lang, n_chars) groups), never documents; boundaries come"
    " back as a BroadcastExchange; the corpus-sized shuffle is the"
    " final (lang, quartile, split) partial-agg rollup.",
    "q77_kmeans_lite": "Two unrolled Lloyd iterations as ONE lazy DAG:"
    " the persisted element table feeds both assignment joins"
    " (BroadcastExchange of the K*D centroid tables) and both"
    " recenter aggregations — no driver loop, each iteration is one"
    " corpus pass.",
    "q78_burst_detection": "Exact-median thresholding: the quantile"
    " window runs over distinct (type, count) histogram rows; the"
    " hourly rollup is the only corpus-sized shuffle and the median"
    " table re-enters as a BroadcastExchange.",
    "q83_cluster_pruned_sample": "Cluster pruning rides the q77 DAG:"
    " final centroids re-enter as a BroadcastExchange onto the"
    " persisted element table; the keep-rank window partitions by"
    " centroid id (bounded groups as K scales with the corpus) — no"
    " global window, no vector shuffle.",
    "q85_oov_rate": "Bounded top-k vocabulary re-enters as a"
    " BroadcastExchange onto the exploded token stream; the only"
    " corpus-keyed shuffle is the per-doc rollup.",
    "q88_asof_last_touch": "As-of join as one user-keyed ordered window"
    " over the unioned event stream: a single Exchange on user_id, no"
    " range join, no BroadcastNestedLoop.",
    "q89_curriculum_stages": "Scale-free global rank: cumulative"
    " offsets computed over the <=101-row score histogram (tiny"
    " window), broadcast back; row_number partitions by score — the"
    " corpus never funnels through one window partition.",
    "q91_bpe_merge_candidates": "Adjacent-pair mint: pair arrays are a"
    " row-local zip (slice+zip_with) — no self-join; counts are"
    " partial-aggregated and the top-20 is TakeOrderedAndProject.",
    "q93_incremental_ann_ingest": "Incremental vector ingest: both"
    " sides assigned by per-row argmin over centroid LITERALS (no"
    " assignment join), presence check equi-joined on the inverted-"
    " list id — batch x list cost, no corpus self-join.",
    "q95_interval_click_attribution": "Range join as (user, hour-"
    " bucket) equi-join: error side exploded across its <=2 buckets,"
    " click side single-bucketed, exact range filter post-join — no"
    " BroadcastNestedLoopJoin in the plan.",
    "q97_token_cooccurrence": "Bounded association mining: the corpus"
    " is LEFT-SEMI thinned to top-vocab tokens before the doc_id-"
    " keyed pair join, so each join group is <=50 rows; df tables"
    " re-enter as BroadcastExchanges.",
    "q102_conversion_latency": "Latency curve: one user-keyed"
    " conditional-min aggregate; the cumulative window runs over the"
    " minute-bucket histogram (time-span-bounded), and the cohort"
    " size enters as a single-row BroadcastExchange — no cross join.",
    "q94_ensemble_dedup": "Ensemble audit: BOTH verify chains (lexical"
    " LSH+Jaccard, semantic bucketed cosine) materialize once into"
    " InMemoryRelations; the union and the two marker joins read the"
    " caches — id-keyed joins on two tiny pair sets, nothing"
    " corpus-sized recomputes per consumer.",
    "q105_curation_funnel": "Single-pass funnel: one corpus scan"
    " attaches boolean stage flags (two id-only marker joins), ONE"
    " aggregate takes all five conditional counts, and the 5-row"
    " funnel unpivots from that row — the tiny-window warning applies"
    " to 5 rows, never documents.",
    "q106_dedup_provenance": "Provenance map: the rank window"
    " partitions by the dropped id (duplicate-family-sized groups);"
    " upstream is the shared persisted candidates + thinned verify"
    " chain.",
    "q107_minhash_estimate_quality": "Estimator audit: the Jaccard"
    " pair set persists once (InMemoryRelation feeding the member-id"
    " derivation AND the final join); signatures are LEFT-SEMI"
    " thinned to candidate members before the agreement join.",
    "q108_jaccard_distribution": "Threshold sensitivity: the decile"
    " rollup partial-aggregates the tiny candidate pair set; the"
    " expensive input is the same shared verify chain.",
    "q110_image_ahash": "Perceptual fingerprint: decode -> resize ->"
    " 64-bit hash entirely inside Arrow-batched mapInPandas (one"
    " Python crossing per batch); zero shuffles, partitioning"
    " inherited from the scan.",
    "q111_image_near_dup": "Image near-dup: the ahash table persists"
    " once (banding + both verify sides read the cache); two-level"
    " rule — hamming-0 stars within identical-hash groups (row-local"
    " after the coarse band window), DISTINCT-hash cap BEFORE the rep"
    " collect_list; star/rep branches each shuffle the narrow banded"
    " rows once; Hamming verify joins ids only.",
    "q112_simhash_near_dup": "SimHash near-dup: 64 per-bit majority"
    " counters partial-aggregate (map-side combine) before the one"
    " (doc_id)-keyed shuffle; two-level banding (signature-group"
    " stars + distinct-signature rep cliques under the cap) and the"
    " Hamming verify run on (id, two longs) — token text never"
    " shuffles; both branches read the signature cache.",
    "q113_cluster_size_histogram": "Family-size histogram: the CC"
    " label table (pair-graph-sized, never corpus-sized) feeds two"
    " tiny rollups; the corpus contributes only a count, and the"
    " singleton row unions in as a literal — no corpus shuffle.",
    "q114_incremental_image_dedup": "Incremental image dedup: batch"
    " bands equi-join the corpus index's GROUP REPRESENTATIVES (one"
    " per distinct hash per bucket, distinct-hash cap; both split"
    " filters pushed to the ahash cache scan), batch side LEFT-SEMI"
    " thinned to surviving buckets — batch x collision cost, corpus never"
    " self-joins; the eager ahash table re-enters all three joins"
    " from cache.",
    "q115_detector_agreement": "Agreement matrix: each detector chain"
    " (lexical, cosine, SimHash) materializes exactly once into an"
    " InMemoryRelation; union + three marker joins run id-keyed on"
    " the tiny pair sets and the rollup is <=7 rows.",
    "q116_pii_audit": "PII audit: per-class regexp_count is a pure"
    " row-local projection in whole-stage codegen — zero shuffles"
    " besides the final order; the pattern list is data, not plan.",
    "q117_image_dedup_keep": "Transitive image keep-list: hash-min"
    " label propagation iterates on the tiny verified image pair"
    " graph (id, label) only; the corpus pays one id-keyed left join"
    " at the end — no corpus-sized shuffle inside the loop.",
    "q118_pii_redaction": "PII excision: the staged redactions are"
    " pre-projected columns in one whole-stage-codegen projection —"
    " each pattern runs once per row, zero shuffles besides the final"
    " order.",
    "q119_crossdoc_repeated_spans": "Exact-substring dedup: per-"
    " position gram hashing is map-side codegen; ONE shuffle keys the"
    " 60-bit INTEGER gram-key space (8-byte longs, never hex strings —"
    " the round-13 gram-key rule; singleton keys die in the partial"
    " aggregate), the hit semi-join reuses the same key, and the span"
    " merge is a per-document window bounded by document length.",
    "q120_hashed_linear_quality": "Learned quality gate shape: the"
    " bucketed weight table enters as a BroadcastExchange (a few MB at"
    " any corpus size), exploded tokens join it map-side, and partial"
    " sums collapse before the single doc-keyed shuffle.",
    "q121_hll_distinct_tokens": "HLL sketch: register maxima partial-"
    " aggregate map-side before a 256-key shuffle; the harmonic fold"
    " runs over one collected 256-element array — the exact-distinct"
    " scalar attaches driver-side, never as a constant-key join.",
    "q122_cms_heavy_hitters": "Count-Min sketch: counter counts"
    " partial-aggregate before one (row, column) shuffle bounded by"
    " d*w; the probe joins the 4096-row counter table as a"
    " BroadcastExchange; top-k is TakeOrderedAndProject.",
    "q123_bloom_decontamination": "Bloom screen: the eval set-bit"
    " table (<= 2^15 rows) broadcasts to the probe side (LEFT-SEMI"
    " on bit); the exact comparison join reuses the deduped gram"
    " hashes — (16-byte hash, doc_id) shuffles, never text.",
    "q124_source_dedup_rates": "Source triage: the verified pair"
    " member set is pair-graph-sized; the corpus pays one id-keyed"
    " left join and a rollup bounded by the source count.",
    "q125_cluster_keep_best": "Quality-aware keep-list: the rank"
    " window partitions by family rep (duplicate-family-sized groups)"
    " — no corpus-wide window state; labels come from the shared CC"
    " chain on the tiny pair graph.",
    "q126_hourly_hll_users": "Grouped HLL: per-(hour, register) maxima"
    " partial-aggregate map-side; the register grid explodes a"
    " 256-element literal per hour (never a cross join), and each"
    " hour's fold runs over one collected 256-element array.",
    "q127_kmv_source_overlap": "KMV sketch matrix: bottom-k per source"
    " via a source-partitioned rank window; the 20 (source, sketch)"
    " structs collect into ONE row and pairs explode row-local (the"
    " q111 bucket pattern — never an inequality self-join/BNLJ); the"
    " exact audit explodes per-token source sets the same way.",
    "q128_prefix_filter_join": "PPJoin prefix filter: two token-table"
    " shuffles (dfreq join, doc regroup) build rare-token prefixes;"
    " the inverted index holds prefix tokens only, a count window"
    " drops over-cap lists BEFORE collect_list, pairs explode"
    " row-local from sorted bucket arrays (q27 pattern), and the"
    " exact verify LEFT-SEMI thins the corpus to candidate members.",
    "q129_containment_join": "Asymmetric prefix filter: one posexplode"
    " emits each doc's ranked tokens tagged with prefix membership, so"
    " the bipartite (prefix x full) candidate explosion is row-local"
    " per token bucket — never a token-table self-join; over-cap"
    " stopword lists drop before collect_list; verify LEFT-SEMI thins.",
    "q130_pps_token_sample": "Systematic PPS: two-phase block cumsum"
    " keyed on the 2-hex hash prefix (block order = hash order, so"
    " block-local windows + a 256-row block-prefix window replace the"
    " corpus-wide global window); total weight attached driver-side"
    " (q52/q102 scalar convention), selection pure integer math.",
    "q131_vocab_growth": "Cumulative-distinct without a running set:"
    " per-type first occurrence is a map-side-combined min-aggregate,"
    " bucket rollups are partial-aggregated, and the only windows run"
    " over the tiny bucket table — one corpus scan total.",
    "q132_cluster_separation": "Reuses the q77 lazy Lloyd chain (el"
    " eager-persisted once, broadcast centroid joins); within-cluster"
    " sums are per-(vec,dim) integer aggregates, and the K x K centroid"
    " distance matrix explodes row-local from ONE collected row of K"
    " centroid vectors — never an inequality self-join.",
    "q133_hist_quantile_sketch": "Sketch side is a map-side-combined"
    " (source, bin) groupBy plus windows over <= 64 histogram rows per"
    " source; only the exact-audit side sorts within a source"
    " partition. The sketch merges by addition shard->source->corpus.",
    "q134_bm25_topk": "Postings built once (eager for the 3 consumers:"
    " vocabulary, doc lengths, scoring); corpus scalars attach"
    " driver-side; the query-term join is a 3-row broadcast; top-k is"
    " TakeOrdered, never a global sort; the rank window runs over the"
    " 20 surviving rows only.",
    "q135_rrf_retrieval_fusion": "Two bounded top-20 rankings (BM25"
    " TakeOrdered + cosine TakeOrdered with integer cos_e4 rank keys)"
    " full-outer-joined on id — the fusion never touches more than 40"
    " rows; the query vector is a broadcast literal (q30 convention).",
    "q136_source_token_drift": "ONE explode pass map-side combined into"
    " (source, token) counts — the persisted intermediate is"
    " vocab x sources sized, never raw token instances; the 50-token"
    " vocabulary + corpus total attach driver-side and the grid"
    " explodes a literal array per source row (q126 rule, no cross"
    " join); windows run over 50 rows per source.",
    "q137_mad_length_outliers": "Two bounded per-source rank windows"
    " (median, then MAD); medians join back id-keyed; no float"
    " moments anywhere, so the rule is outlier-robust and"
    " engine-exact.",
    "q138_tokenizer_fertility": "Row-local regex counting over the"
    " shared normalization; one map-side-combined groupBy; integer"
    " e3 ratio — no windows, no joins.",
    "q139_gap_quantile_sketch": "Gaps from one user-partitioned lag"
    " window; power-of-two buckets via length(bin(gap_ms)) collapse"
    " to ~40 mergeable counters per event type (map-side combined);"
    " cumulative/est windows run over those counter rows only; only"
    " the exact-audit side ranks within an event type.",
    "q140_regional_revenue_rollup": "TPC-H Q5 shape: the one-year"
    " date filter pushes to the orders scan (PushedFilters), thinning"
    " the lineitem⋈orders shuffle join; customer and supplier join"
    " keyed (both scale with data); nation/region are explicit"
    " broadcasts; revenue is per-row floor-scaled cents so the sum is"
    " a partial-aggregated integer.",
    "q141_pq_code_assignment": "Per-row argmin over 4x8 broadcast"
    " codeword literals (-2ec+cc surrogate) — zero joins; the explode"
    " emits 4 rows/vector and the groupBy lands on 32 (m, code)"
    " groups, map-side combined; error mass is per-row floor-scaled"
    " int e6 before the cross-row sum.",
    "q142_encoding_anomaly_audit": "Row-local strip-and-subtract"
    " length deltas for the three anomaly classes; one map-side-"
    "combined groupBy on source — no windows, no joins.",
    "q143_hard_negative_mining": "q33 plan shape: signature table"
    " eager-persisted once, one shuffle on the 1-byte bucket key,"
    " cosine only in-bucket; the per-vector argmax window partitions"
    " by a_id (bucket-sized groups), never global.",
    "q144_token_budget_waterfill": "One map-side-combined corpus"
    " groupBy to per-source token counts; every window (prefix sum,"
    " rank, global max) runs over the handful of per-source rows;"
    " budget scalar attached driver-side — no lit==lit join.",
    "q145_pq_adc_recall": "Zero-join ADC: the query-to-codeword"
    " distance literal rides inside the assignment argmin struct, so"
    " scan + TakeOrderedAndProject is the whole approximate side;"
    " the rank windows and recall join run over two 10-row sets.",
    "q146_rolling_hll_users": "The rolling union is a bounded"
    " contribution explode on the SPARSE per-(hour, register) rows"
    " (x24, equi-keyed groupBy max) — no range self-join, no BNLJ;"
    " the 256-register grid completes per observed hour only; the"
    " exact audit reuses the same explode over distinct (hour, user)"
    " pairs.",
    "q147_temporal_split_audit": "One corpus pass builds both split"
    " aggregates (conditional sums/distincts, partial-aggregated);"
    " the overlap is an equi-join of two distinct (type, user) sets,"
    " each thinned by DISTINCT before the shuffle.",
    "q148_stream_enrichment_rollup": "events joins customer keyed"
    " (the dim scales with data), nation broadcast; the rollup is"
    " partial-aggregated. The streaming twin (enrich_stream) runs"
    " the same joins per micro-batch with complete-mode state bounded"
    " by the (nation, type) key space.",
    "q149_seqlen_truncation_frontier": "One corpus pass; the 4-value"
    " candidate grid explodes from a literal per row (never a cross"
    " join); the shuffle carries (L, partial integer sums) — 4"
    " groups.",
    "q150_snapshot_diff_audit": "Full-outer join on doc_id carrying"
    " only (id, source, 16-byte md5) — text never leaves the scan"
    " stage; the status rollup is partial-aggregated per source.",
    "q151_neyman_allocation": "One map-side-combined groupBy to"
    " per-source integer moments; the only float op is one IEEE sqrt"
    " per source row; normalization folds ~20 doubles driver-side"
    " (bounded-scalar pattern) — no global window, no lit==lit join.",
    "q152_corpus_rollup_totals": "All three grains in ONE pass: Spark"
    " expands the ROLLUP grouping sets inside a single Expand +"
    " partial-aggregated HashAggregate — no per-grain re-scan, no"
    " union.",
    "q153_session_funnel": "User-partitioned lag + cumsum windows"
    " assign sessions deterministically ((ts, event_id) order); stage"
    " first-times partial-aggregate per (user, session); the final"
    " rollup is 5 rows.",
    "q154_join_size_forecast": "Both count tables partial-aggregate"
    " before their key-distinct-sized join — the forecast never"
    " touches row-sized data; total attaches driver-side; top-5 via"
    " TakeOrderedAndProject.",
    "q155_referential_integrity_audit": "Five key-only probes: child"
    " FK column LEFT JOINs the distinct parent-key projection (small"
    " parents broadcast); each edge reduces to a 1-row aggregate"
    " before the union.",
    "q156_split_ks_drift": "Row-local split hash; one groupBy to the"
    " distinct-length histogram; cumulative/total windows run over"
    " that bounded value table, never the corpus; the final argmax is"
    " a 1-row aggregate.",
    "q157_hourly_seasonality": "hour() field extraction is row-local"
    " and tz-independent on NTZ; one partial-aggregated groupBy; the"
    " share window runs over 24 rows per type.",
    "q158_repeat_purchase_profile": "Per-user lag windows over the"
    " purchase series only; hour-floored gaps bound the distinct-value"
    " space, so the quantiles come from a cumulative histogram, not a"
    " global sort; two 1-row aggregates assemble driver-side.",
    "q159_attribution_model_compare": "Conversion-touch join is EQUI"
    " on user_id (the 24h window is a post-join filter — keyed join,"
    " never BNLJ); per-conversion rank windows are touch-set-sized;"
    " the rollup is channel-count rows.",
    "q160_skeleton_template_dupes": "Row-local skeleton regex + md5;"
    " one 16-byte-key groupBy (map-side combined); top-20 via"
    " TakeOrderedAndProject.",
    "q161_copurchase_lift": "Pair generation is a self-join KEYED on"
    " l_orderkey (fanout bounded by lines-per-order, linear in"
    " orders); part-frequency joins are keyed on the part; n_orders"
    " is a bounded driver scalar; top-20 via TakeOrderedAndProject.",
    "q162_rfm_segments": "One order-keyed aggregation to the customer"
    " grain; the three ntile windows are global but run over the"
    " customer DIMENSION (annotated single-partition); 64-segment"
    " rollup.",
    "q163_ship_latency_quantiles": "lineitem⋈orders keyed join;"
    " day-floored gaps bound the distinct space so the per-priority"
    " cumulative-histogram windows run over histogram rows, never the"
    " fact table.",
    "q164_winnowing_overlap": "Row-local HOF gram hashing + window"
    " minima; pairs via a KEYED inverted-index join on the fingerprint"
    " with posting lists capped at 16 (MOSS rule) — never all-pairs;"
    " the kept posting set eager-persists once for count + pair fanout.",
    "q165_pareto_abc": "q51 two-phase cumsum over revenue bands:"
    " band-local windows in parallel, the global window runs over"
    " band-TOTAL rows only; corpus total is a bounded driver scalar;"
    " 3-row rollup.",
    "q166_supplier_hhi": "Supplier-keyed revenue aggregation; shares"
    " floored to integer ppm per row BEFORE the cross-row HHI sum;"
    " nation broadcast; 25-row output.",
    "q167_discount_elasticity": "Row-local integer banding; one KEYED"
    " lineitem⋈part join (part scales — no broadcast); single"
    " partial-aggregated groupBy to brands x ~11 bands.",
    "q168_scd2_version_profile": "Integer-strict JSON extraction in"
    " codegen; all windows partition by user (series-sized, ROWS"
    " frames, event_id tie-break); two tiny rollups to the churn"
    " profile.",
    "q169_zipf_coverage": "Two-phase exact rank over log2 count bands"
    " (~64 band rows at any scale); the global prefix window runs over"
    " the band-count table; tail bands pruned BEFORE the within-band"
    " row_number — the singleton tail is never sorted.",
    "q170_winnowing_contamination": "Shared winnow_fingerprints chain;"
    " eval side DEDUPED before the KEYED fph join (1:1 fanout per"
    " training doc); train posting set eager-persisted once for the"
    " nf + hit consumers; top-20 via TakeOrderedAndProject.",
    "q171_source_template_matrix": "One skeleton-keyed groupBy; the"
    " pair join is keyed on the 16-byte hash with fanout bounded by"
    " the SOURCE dimension; output <= C(#sources, 2) rows.",
    "q172_peak_concurrency": "Per-user session windows (series-sized);"
    " the global edge cumsum is two-phase over HOUR bands — the band"
    " prefix window runs over a calendar-bounded band table; three"
    " bounded driver scalars assemble the single-row result.",
    "q173_coverage_gaps": "Distinct (type, hour) collapses events"
    " map-side; the gap window runs over calendar-bounded hour rows;"
    " per-type rollup.",
    "q174_growth_accounting": "Per-user lag/lead windows over the"
    " distinct (user, week) grain, eager-persisted once for the"
    " activity + churn consumers; calendar-bounded weekly FULL join.",
    "q175_ab_conversion": "Row-local md5 arm assignment in codegen;"
    " one user-keyed aggregation; 2-row arm rollup.",
    "q176_bpe_iterated_merges": "Three unrolled BPE merge rounds: per-"
    "doc window algebra (lead/cumsum/lag partitioned by doc_id —"
    " doc-length-bounded) rewrites the persisted token stream, each"
    " round's rule a bounded 1-row driver scalar; pair counts are"
    " partial-agg groupBys on the pair string; final union is 3 rows.",
    "q177_incremental_contamination": "Batch-only winnowing: the"
    " documents scan is id/source-thinned BEFORE gram hashing (only"
    " the new batch pays HOF compute), the eval index is a distinct"
    " fph set, and the screen is one fph-keyed LEFT-SEMI join + per-"
    "doc rollup — cost scales with the batch, never the corpus.",
    "q178_stream_seasonality": "The dumped plan is the post-drain"
    " select over the memory sink (24 x types rows; share window over"
    " per-type groups) — the streaming execution itself ran"
    " availableNow inside the builder, complete-mode state bounded by"
    " the key space.",
    "q179_bpe_vocab_budget": "The dumped plan is the bounded minted-"
    "rules literal (<= 5 rows, createDataFrame): each budget round ran"
    " q176's per-doc window algebra + partial-agg pair count inside"
    " the builder, parameterized by the same 1-row collect that"
    " enforces the tf floor — an early-out SKIPS the remaining rewrite"
    " rounds entirely.",
    "q180_exact_substring_verify": "Winnowing fingerprint pass + fph-"
    "keyed pair join (q164 chain) feeds an eager-persisted candidate"
    " set; the corpus is LEFT-SEMI thinned to candidate MEMBERS before"
    " the row-local 34-char gram explode to the 60-bit integer key;"
    " verify joins key member id + 8-byte gram key (round-13 gram-key"
    " rule); final left join keeps unverified pairs at 0.",
    "q181_pq_codebook_refresh": "Zero-join broadcast-literal argmin"
    " (q141 shape) + row-local floor-scaled subvector explode; per-dim"
    " sums shuffle on (m, code, d) = 512 groups (map-side partial agg"
    " does the reduction); drift joins the 512-row broadcast codeword"
    " grid; 32-row output via the driver-side code grid left join.",
    "q182_stream_peak_concurrency": "The dumped plan is the bounded"
    " 1-row assembly (createDataFrame from three driver scalars over"
    " the eager-persisted edge table) — the applyInPandasWithState"
    " interval tracker ran availableNow inside the builder; state is"
    " three longs per user, edges band-decompose as in batch q172.",
    "q183_ann_tree_assignment": "Pure row-local tree walk: per level"
    " an element_at on a map LITERAL + array_min fold over <= BRANCH"
    " candidate structs — no join, no shuffle before the 16-group"
    " histogram aggregation; per-row cost BRANCH x depth vs q93/q141's"
    " flat K literals.",
    "q184_stream_session_funnel": "The dumped plan is the post-drain"
    " convergence rollup over the memory sink (per-session monotone"
    " mins -> the q153 CASE -> 5-row rollup) — the"
    " applyInPandasWithState funnel tracker ran availableNow inside"
    " the builder; state is six longs per user.",
    "q185_bpe_tokenize_apply": "Per applied rule one doc_id-keyed"
    " window pass over the persisted token stream (the q176 greedy"
    " algebra), then two per-doc count rollups joined on doc_id —"
    " everything doc-length-bounded; rules arrive as bounded 1-row"
    " collects.",
    "q186_ivf_list_rebalance": "Zero-join broadcast-literal argmin over"
    " the index-trained centroids (q93 shape); ONE corpus pass feeds a"
    " <= K-group aggregation carrying two partial counters; the K-row"
    " driver grid left-join surfaces empty lists; corpus total is a"
    " bounded 1-row scalar inlined as a literal.",
    "q187_lexical_detector_overlap": "Both pair sets from their"
    " bucketed generators (LSH bands / capped winnowing posting"
    " lists), each eager-persisted once; union-distinct + two id-keyed"
    " marker joins on the tiny pair sets; <= 3-row matrix rollup.",
    "q188_tree_depth3_assignment": "The q183 row-local walk at depth"
    " 3: three element_at/array_min levels over map literals (84"
    " embedded leaf vectors) — no join, no shuffle before the 64-group"
    " histogram aggregation; per-row cost BRANCH x 3 vs flat 64.",
    "q189_tree_flat_agreement": "ONE corpus pass evaluates both"
    " row-local assignment expressions (flat 16-literal argmin + tree"
    " walk); groupBy carries (flat, tree) counters into <= K^2 groups,"
    " eager-persisted for the three K-row bookkeeping consumers;"
    " driver-side leaf grid left-joins close the output.",
    "q190_tree_probe_recall": "Query leaf via a vec_id-pushed 1-row"
    " scan of the SAME walk expression; one corpus pass filters to the"
    " leaf list (partition pruning at scale) + scores cosine,"
    " eager-persisted for count + rerank; broadcast semi-join of two"
    " 10-row top-k sets; 1-row output.",
    "q191_winnow_posting_histogram": "Row-local fingerprint HOF chain"
    " feeds two narrow partial-agg shuffles — (fph, count) then"
    " (sz, count); document text never shuffles; <= max-list-size"
    " output rows.",
    "q192_bigram_lm_fit": "Row-local bigram construction over the"
    " eager-persisted token-pair stream (three consumers); model"
    " tables shuffle on token keys with map-side combine; V attaches"
    " as a bounded driver scalar; scoring is one bigram-keyed join +"
    " one doc_id rollup; LEFT join back to the corpus closes it.",
    "q193_quality_calibration": "Two row-local scorers (q120 broadcast"
    " weight join + rollup, q25 projections) meet in ONE doc_id"
    " equi-join; fixed-width double-floor binning (no corpus quantile"
    " sort); tiny bin-keyed aggregation output.",
    "q194_soft_dedup_weights": "q69's verified-pair CC reused as-is"
    " (bucketed LSH + clique/star cap + label propagation on the tiny"
    " pair graph, eager-persisted); one count over the label table,"
    " one id-keyed join back, row-local md5 coin — text never"
    " shuffles; global sort on the narrow output only.",
    "q195_winnow_drop_share": "One fph-keyed partial agg sizes posting"
    " lists; over-cap set LEFT-joins back as a marker; per-doc rollup"
    " in integer ppm — two narrow shuffles, text never shuffles.",
    "q196_embedding_split_leakage": "q33's hyperplane-bucketed pair"
    " generation as-is; split CASEs applied row-locally to both pair"
    " sides (no split-table join); eval-side keyed rollup over the"
    " tiny verified pair set.",
    "q197_tree_multiprobe_recall": "ONE tree-walk pass (round-13"
    " restructure): corpus filters to the IN-list of the max-width"
    " probe leaves (partition pruning at scale) and cosine-scores"
    " once; each candidate carries its leaf's probe rank, width"
    " membership explodes row-locally, per-width top-10 is one"
    " row_number window over the tiny candidate set; exact top-10"
    " joins as a 10-row broadcast; 3-row output.",
    "q198_stream_click_attribution": "Two watermarked streams over the"
    " same feed meet in a stateful inner interval join (state bounded"
    " by the 2h eviction delay); drained pairs group to (event_id,"
    " n); batch LEFT join against the error side closes q95's exact"
    " assembly.",
    "q199_star_fallback_recall": "Seed signatures LEFT-SEMI thinned to"
    " 24 docs before shingling; synthetic band rows replicate"
    " row-locally (verbatim copies share signatures by definition);"
    " both candidate graphs bounded (<= 24 x 30 members); two CC"
    " label propagations on (id, label) pairs; 1-row agreement"
    " rollup.",
    "q200_dsir_importance_weights": "Row-local bigram->md5-bucket"
    " stream (text never shuffles); ONE bucket-keyed partial agg fits"
    " both smoothed distributions (conditional sums, map-side"
    " combine); the <= bucket-count model broadcasts back; doc_id"
    " rollup; corpus sizes attach as driver-bounded scalars (q52"
    " pattern, no constant-key join).",
    "q201_repetition_removal_audit": "Gram starts enumerate row-locally"
    " behind a size>=gram CASE guard (short docs emit array(), never"
    " a descending sequence); first-occurrence min over (doc_id, gram);"
    " gaps-and-islands running-max union per doc (explicit ROWS"
    " frame); doc_id rollup joins back id-keyed — wide keys are"
    " (doc_id, gram) and doc_id only.",
    "q202_contamination_cap_recall": "12 seed docs fingerprint once"
    " (eager; ev/tr/posting-sizing all read it); verbatim families"
    " replicate as fingerprint rows row-locally (q199 inflation"
    " trick); the production cap-free screen and the capped keep rule"
    " both run over constant-bounded frames; 1-row recall rollup.",
}


def main() -> None:
    from smartbulkcopy_spark.queries import REGISTRY
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.001"

    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        "Generated by `tools/dump_plans.py` (sf0.001, AQE on). These are",
        "the plans graded in `tests/test_plans.py`; regenerate after any",
        "query change.",
        "",
    ]
    for name, note in ANNOTATED.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        out += [f"## {name}", "", note, "", "```", buf.getvalue().rstrip(), "```", ""]

    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'}")


if __name__ == "__main__":
    main()

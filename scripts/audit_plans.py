"""Generate PLANS.md: physical-plan audit of representative queries.

For each audited query we record the scan pruning (ReadSchema /
PushedFilters), the join/exchange skeleton, and a note on why that shape
is the one we want at 100 TB. Run after plan-affecting changes:

    python scripts/audit_plans.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from metadata_enhanced_pretrain_datapipeline_spark import queries as q
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

SF = "/root/testdata/sf0.01"

AUDITS = {
    "q_scan_parquet": "Projection-only scan: ReadSchema pruned to the 4 selected columns.",
    "q_predicate_filter": "All three predicates pushed to the parquet scan.",
    "q_join_multiway": "4 dimension joins broadcast; the fact table never "
    "shuffles before the final aggregation Exchange (one shuffle total).",
    "q_flagship": "Blocklist anti-join is a BroadcastHashJoin (LeftAnti); "
    "filters+PII regex run in one codegen stage over the scan.",
    "q_asof_event_join": "Union+window as-of plan: exactly one Exchange on "
    "the join key (a join+argmax formulation would need two).",
    "q_tpch_q1": "Scan-heavy aggregate: shipdate predicate pushed, partial "
    "aggregation map-side, one Exchange.",
    "q_minhash_lsh_pairs": "ONE FileScan: signatures are a narrow "
    "projection under a single (band,key) Exchange; the size guard is a "
    "window count on that clustering and pairs come from collect_list + "
    "array combinations — no self-join, no broadcast, no recompute.",
    "q_top_k": "TakeOrderedAndProject: per-partition partial top-k, single "
    "merge — no global sort.",
    "q_pack_sequences": "W2 packing: one range Exchange on shard, then the "
    "sequential fold runs in MapInArrow (token arrays as Arrow buffers — "
    "no pickled rows).",
    "q_embedding_near_dup": "LSH-bucketed near-dup: bucket key computed in "
    "codegen under one bucket Exchange; window-count guard drops "
    "singleton/degenerate buckets before the in-bucket join.",
    "q_deterministic_shuffle": "Scalable global rank: range boundaries are "
    "plan literals; one Window per range partition, no full-data persist.",
    "q_robots_filter": "Python REP matcher fed ONLY by hosts present in "
    "the broadcast robots set (InSet pre-filter); robots-exempt docs take "
    "the pure-JVM Union branch.",
    "q_contamination_hits": "Decontamination: the benchmark shingle-hash "
    "set broadcasts (tiny vs corpus); corpus shingles are filtered in "
    "place by the BroadcastHashJoin — the only shuffle is the per-doc "
    "hit-count aggregation.",
    "q_token_budget_cap": "Bucketed budget cap: ONE (group, bucket) "
    "Exchange for the in-bucket running-sum Window plus the broadcast "
    "offsets join — no per-group single-task sort at any width.",
    "q_temperature_mix": "Source mixing: the corpus scan is shuffle-free "
    "(keep test is a narrow filter against broadcast per-source rates); "
    "the only Exchanges sit on the tiny counts side.",
    "q_boilerplate_removal": "Cross-doc boilerplate: detection agg on "
    "per-doc-distinct lines, anti-join against the (AQE-broadcast) "
    "boilerplate set, one positional-regroup Exchange keyed by doc.",
    "q_char_lm_score": "Char-LM scoring: the alphabet-bounded model and "
    "first-char totals broadcast; the corpus explodes to bigrams once "
    "and re-aggregates keyed by id — no other shuffle.",
    "q_url_canonical_dedup": "URL dedup: canonicalization is pure "
    "codegen; one Exchange on the canonical key for the first-id window.",
    "q_salted_join": "Skew-salted join with a PINNED strategy (merge by "
    "default, r6): Catalyst size-estimates the salt-replicated side "
    "pre-explode and would broadcast it (driver OOM at scale); the "
    "sort-merge pin keeps the never-broadcast contract with a SPILLABLE "
    "build — the sf10 probe measured SHJ OOM at 250 MB/core and 3.1x "
    "slower at 48 GB, so the spill-safe form is the scale default.",
    "q_mix_pipeline": "Composed dedup→decontaminate→gate→host-cap→mix→"
    "budget→split: the gated corpus materializes ONCE before the "
    "multi-action tail (per_host_cap + token_budget_cap offset collects, "
    "then the final agg) so the minhash+decontamination subtree executes "
    "once; the pair set materializes once and feeds both the greedy drop "
    "and the split's cluster closure; the split joins only the tiny "
    "cluster map back.",
    "q_snapshot_pipeline": "Monthly-snapshot chain: exact dedup is a "
    "digest-only anti-join (seen side reduced to DISTINCT 60-bit "
    "digests); fuzzy dedup touches the old corpus only as (band,key) "
    "store rows; the kept set materializes once before the multi-action "
    "split tail; all iteration lives in the pointer-doubling subtree "
    "over pair ids.",
    "q_band_store_pruned_probe": "On-disk store probe: the band-subset "
    "filter arrives as PartitionFilters on the band=<b>/ directory "
    "layout (file-listing pruning, asserted in-query); the probe join "
    "moves only (id, band, key) rows; kept ids return via an ids-only "
    "anti-join.",
    "q_bucketed_join_noshuffle": "Bucketed co-located join: both scans "
    "read the 8-bucket layout, the SMJ and the following agg on the "
    "bucket key reuse that distribution — the plan contains ZERO "
    "Exchange nodes (asserted in-query).",
    "q_dynamic_partition_prune": "Join-driven partition pruning: the "
    "filtered tier dim broadcasts, and its lang values feed a "
    "dynamicpruningexpression in the fact scan's PartitionFilters "
    "(asserted in-query) — only the curated langs' directories are "
    "listed/read at run time.",
    "q_band_store_colocated_probe": "Full-probe store layout: the "
    "(band,key)-bucketed store scan satisfies the join clustering, so "
    "the BIG side joins with no exchange — exactly one hashpartitioning "
    "Exchange in the plan, the new snapshot's (asserted in-query).",
    "q_line_dedup_within_doc": "Within-doc line dedup: one explode, one "
    "(id, line) window — the partition key is bounded by per-document "
    "line counts (never corpus-hot) and the rebuild collect is bounded "
    "by document size; nothing crosses documents.",
    "q_simhash_pairs": "SimHash pair generation: fingerprints in one "
    "codegen projection, ONE (chunk, value) exchange, window-count "
    "degenerate guard, bounded collect_list pair expansion, xor "
    "distance verify in codegen — the minhash_lsh_pairs shape on the "
    "hamming metric.",
    "q_tpch_q8": "Deepest dim chain in the suite: part, supplier, "
    "customer, nation x2, region ALL broadcast — 7 BroadcastHashJoins "
    "stacked on the lineitem scan, ONE Exchange total (the final 2-group "
    "agg). The fact table never shuffles.",
    "q_tpch_q19": "Disjunctive AND-OR join predicate: Catalyst extracts "
    "the common l_partkey equi-key, so the plan is a BroadcastHashJoin "
    "with the OR-of-ANDs as join condition — NOT a nested-loop — and "
    "per-side IN/range disjunctions pushed to each scan.",
    "q_tpch_q21": "Double correlated EXISTS/NOT-EXISTS decorrelated into "
    "ONE per-order countDistinct aggregate (n_supp>1 AND n_supp_r=1) "
    "semi-joined back — two lineitem passes total instead of two "
    "correlated re-scans per row.",
    "q_window_suite": "Five window functions (row_number/ntile/"
    "percent_rank/lead/moving sum) over one spec collapse into ONE "
    "Window node behind ONE Exchange — adding functions to the same "
    "spec is free at 100 TB.",
    "q_cube_events": "CUBE is a Catalyst Expand: one events pass emits "
    "all 4 grouping combinations into a single partial-agg shuffle; no "
    "per-level rescan.",
    "q_pivot_events": "Pivot with DECLARED values: no distinct-discovery "
    "job; partial (cohort,event_type) agg shuffles once, the second "
    "Exchange moves only the vocab-sized agg.",
    "q_segment_dedup": "Segment first-wins: groupBy-MIN on the integral "
    "order key (map-side combine — hot boilerplate digests reduce "
    "per-partition, no row_number window on a skewed digest); the "
    "firsts side joins back by (digest, key). The segment explode "
    "recomputes on both join sides — deliberate: re-scanning parquet "
    "beats materializing an exploded 100 TB corpus.",
    "q_bloom_dedup": "Bloom-prefiltered anti-join: the probe is one "
    "vectorized ArrowEvalPython over JVM-computed positions; definite "
    "misses bypass the shuffle, only maybe-hits reach the exact "
    "anti-join. Probe recomputes per DAG branch (misses/maybes) — "
    "cheap vs persisting the corpus.",
    "q_tfidf_top_terms": "TF-IDF: one token explode into the (doc,term) "
    "partial-agg shuffle; doc-frequency and N are vocab-/1-row-sized "
    "BroadcastExchanges back onto it; top-k is a per-doc rank window.",
    "q_leakage_safe_split": "Cluster-coherent split: the corpus side is "
    "ONE id-only left join against the (pair-graph-sized, AQE-broadcast "
    "when small) cluster map plus a pure-codegen hash projection — the "
    "text never shuffles; all iteration lives in the pointer-doubling "
    "cluster subtree whose per-round joins touch only pair ids.",
    "q_per_host_cap": "Per-host cap: per-(host,bucket) count agg (tiny) "
    "-> broadcast offsets prune buckets past the cap BEFORE the window "
    "Exchange, so the in-bucket rank sorts only surviving rows — no "
    "single-task sort of a mega-host.",
    "q_minhash_dedup_against": "Incremental fuzzy dedup: only the NEW "
    "snapshot is shingled/minhashed (one codegen projection); the store "
    "side is band keys only, distinct-ed before the (band,key) join; "
    "flagged ids return through an ids-only anti-join — the old corpus "
    "text is never read.",
    "q_range_frame_agg": "Trailing-5-minute sliding aggregate as a RANGE "
    "window frame on epoch seconds: one Exchange by user, no self-join, "
    "no explode — the frame scan is linear in events.",
    "q_expectation_summary": "All data-quality rules fold into ONE "
    "map-side-combined scalar aggregate (bytes move, not rows); the "
    "per-rule output is an explode of that 1-row result.",
    "q_funnel": "Ordered funnel: per-stage conditional min-aggs joined "
    "user-wise; reached-user sets are AQE-sized (never force-broadcast — "
    "stage 1 can be every user), no event-history arrays.",
    "q_cohort_retention": "Cohort retention: integral epoch-week "
    "arithmetic in codegen; per-user min agg + one (cohort, offset) "
    "count over the user-distinct activity set.",
    "q_zorder_stats": "Morton key is a pure shift/add codegen chain; "
    "the layout op is repartitionByRange + sortWithinPartitions on it — "
    "one range shuffle, every output file a bounded (x, y) rectangle.",
    "q_keyed_rank": "Scalable within-key rank: pruned 3-column scan, "
    "range-id as a literal-array size/filter expression in the scan "
    "project, ONE Exchange on (key, range) — num_ranges x keys window "
    "partitions instead of one per key; offsets are an O(1) two-level "
    "literal lookup in the final project (no join, no second scan).",
    "q_keyed_window_suite": "Full window family on the keyed_rank "
    "clustering: all (key, range) windows share one Exchange + Sort; "
    "ntile/percent_rank are closed-form projections of (rn, total-map); "
    "lead/moving-sum boundary fixes are literal-map lookups guarded to "
    "boundary rows only.",
    "q_runtime_bloom_filter": "Runtime bloom filter: "
    "might_contain(scalar-subquery(bloom_filter_agg)) injected into the "
    "FACT scan's filter — selective-dim semi-filtering with zero "
    "physical layout; rows drop before the join shuffle.",
    "q_band_store_compact": "Store compaction: union of monthly stores "
    "-> distinct on (id, band, key) longs (one narrow Exchange), "
    "repartition(band, key) clustered rewrite; the probe against the "
    "compacted store keeps its PartitionFilters.",
    "q_histogram": "Equi-width histogram: 1-row min-max broadcast, "
    "binning projection in codegen, one count shuffle.",
    "q_bm25_topk": "BM25 retrieval: the query-term InSet filter sits "
    "between the explode and the first aggregation, so the corpus-sized "
    "token stream dies in the scan stage and only query-term postings "
    "ever shuffle; df_t is a window count over that tiny postings "
    "relation (no corpus re-scan for the fork); (N, avgdl) is a 1-row "
    "broadcast; the top-k is TakeOrderedAndProject.",
    "q_semantic_dedup": "SemDeDup: pair generation reuses the "
    "embedding_near_dup shape (bucket key in codegen under ONE bucket "
    "Exchange, window-count degenerate-bucket guard); the drop set is "
    "distinct ids only and the corpus comes back through one ids-only "
    "anti-join — vectors never shuffle twice, text never shuffles at all.",
    "q_dedup_keep_best": "Quality-aware resolution: all iteration lives "
    "in the pointer-doubling cluster subtree (pair ids only); quality "
    "joins onto cluster MEMBERS (id + one scalar — never text); the "
    "per-cluster argmax window partitions by cluster_id (duplicate-"
    "cluster-sized groups); losers return via one ids-only anti-join.",
    "q_quantized_topk": "int8 ANN: quantization + integer dot products "
    "are one codegen projection over the scan (no shuffle of vectors), "
    "top-k is TakeOrderedAndProject; the stored form (array<tinyint> + "
    "scale) reads a quarter of the float32 bytes at 100 TB.",
    "q_dsir_top_n": "DSIR selection: raw and target text are each read "
    "ONCE (single concatenated uni+bigram feature array, one explode; "
    "counts materialized as (id,bucket,c) longs at the checkpoint "
    "boundary); bucket models and log-ratios are broadcasts; the final "
    "plan is aggregations over the narrow counts relation + "
    "TakeOrderedAndProject.",
    "q_quantized_store_probe": "The production ANN layout: bucket "
    "equality arrives as a PartitionFilter on the stored layout (one "
    "bucket's files read) and the scan reads array<tinyint> codes "
    "(3.7x fewer bytes); scoring is the exact-integer prequantized "
    "path, top-k is TakeOrderedAndProject.",
    "q_ivf_quantized_probe": "The COMPOSED production ANN store: "
    "list_id IN (nprobe lists) arrives as PartitionFilters on the "
    "IVF directory layout AND the scan's ReadSchema is array<tinyint> "
    "codes with qscale pruned away — both scale levers (directory "
    "pruning x 3.4x fewer bytes) in one machine-asserted plan.",
    "q_ivf_quantized_rerank": "Two-stage retrieval: stage 1 is the "
    "pruned int8 store probe above (k x overfetch candidates); stage 2 "
    "broadcasts the candidate IDS into a left_semi against the float "
    "corpus and re-ranks the survivors with exact cosine — the "
    "expensive float column is only ever read for k x overfetch rows.",
    "q_hybrid_rrf": "Hybrid retrieval: each leg is its own top-k "
    "(InSet postings / TakeOrdered); the fusion sees at most sum(k) "
    "rows, so union + one tiny groupBy is the whole added plan.",
    "q_cluster_balanced_sample": "Cluster-balanced downsample: "
    "ivf_assign's O(k) argmax is a codegen projection (vectors never "
    "shuffle); the per-cluster cap runs per_host_cap's bucketed "
    "two-phase shape — counts agg, driver offsets, pruned in-bucket "
    "window — never a single-task mega-cluster sort.",
    "q_unimax_sample": "UniMax sampling: one tiny (lang, token-sum) "
    "agg feeds the driver-side allocation walk; the per-language cap "
    "is token_budget_cap's bucketed two-phase shape with the budgets "
    "riding the offsets broadcast — the corpus text never shuffles.",
    "q_stream_ivf_append": "Stream-built ANN store: the probe plan "
    "over the appended layout is IDENTICAL to the batch store's — "
    "PartitionFilters on list_id, tinyint ReadSchema — because both "
    "paths run the shared ivf_quantized_codes projection.",
    "q_hard_negative_mine": "Multi-query ANN mining: the bounded "
    "query set broadcasts (one BroadcastNestedLoopJoin fan-out, "
    "corpus scanned once); per-query top-k is two HashAggregates "
    "(per-partition truncated arrays, bounded merge) — no per-query "
    "Window sort over the corpus.",
    "q_image_near_dup": "Visual dHash near-dup: blobs decode once in "
    "one MapInPandas into 12-byte (id, hash64) rows; everything after "
    "— chunk Generate, bucket self-join, bit_count verify — exchanges "
    "hashes only, never pixels.",
    "q_video_near_dup": "Frame-overlap near-dup (token-set Jaccard "
    "engine): distinct + two Window counts on (id, token), then the "
    "counted rows hit an InMemoryRelation boundary so the bucketed "
    "self-join reads the subtree once, not twice; per-pair "
    "intersections are one HashAggregate — set sizes ride the rows.",
    "q_audio_near_dup": "Energy-sign fingerprints: the Haitsma-Kalker "
    "bit-pack is a pure codegen Horner chain (no Python); near-dup "
    "pairs reuse the same materialized token-set Jaccard skeleton as "
    "video.",
    "q_token_dedup_against": "Incremental token-set dedup: the seen "
    "STORE joins by token only — new-month rows carry their sizes, "
    "store set sizes come from the store's own persisted counts; no "
    "re-aggregation of history.",
    "q_image_dedup_against": "Incremental visual dedup: new blobs "
    "decode once; the hash store joins on bucketed chunks "
    "(equi-join, no cross month-vs-store product).",
    "q_semantic_decontam": "Flat semantic decontamination: the counted"
    "+guarded benchmark broadcasts; the corpus fans out ONCE through a "
    "BroadcastNestedLoopJoin, hits reduce to distinct ids, and the "
    "kept corpus is a LeftAnti on ids — the embedding column never "
    "shuffles.",
    "q_semantic_decontam_ivf": "IVF-probed decontamination: corpus "
    "rows get a nearest-centroid list_id (O(k) argmax expression), "
    "each benchmark vector probes its nprobe lists, and the hit scan "
    "is an equi-join on list_id — work/nlists instead of |corpus| x "
    "|benchmark|.",
    "q_corpus_lifecycle": "The composed monthly chain: every stage is "
    "the production operator (band-store dedup, stream append, "
    "codebook-stamped compaction), and the final probe plan shows the "
    "same PartitionFilters + tinyint ReadSchema as the standalone "
    "store probes — composition adds no new exchange.",
    "q_containment_pairs": "Broder containment over the shared shingle "
    "inverted-index skeleton: one shingle-keyed Exchange, set sizes "
    "ride the rows, min-denominator is a projection — no plan "
    "difference from the Jaccard twin but the final expression.",
    "q_pq_adc_topk": "PQ/ADC retrieval: encode is a narrow projection "
    "(m literal-codebook argmaxes, O(m) nodes), the query LUT is "
    "driver-built literals, scoring is m array lookups + adds, and "
    "the top-k is TakeOrderedAndProject — zero joins, zero shuffles "
    "before the single merge.",
    "q_ivfpq_probe": "IVFPQ store probe: PartitionFilters carries the "
    "nprobe list set at file-listing time, ReadSchema holds only "
    "tinyint codes (+ coarse id), per-list LUT terms are literal "
    "maps — the scan reads m+1 bytes per row of a 32x-smaller "
    "layout.",
    "q_weighted_sample": "A-ES weighted sample: race key is one "
    "projection over the scan, then TakeOrderedAndProject — the "
    "weighted reservoir with no sequential pass and no full sort.",
    "q_weighted_sample_per_group": "Per-group A-ES sample: keyed_rank's "
    "three-phase shape — quantile boundaries as literals, one bounded "
    "(key, range) count agg, in-range window — no per-language "
    "single-task sort.",
    "q_doremi_mix": "DoReMi mix: one tiny (domain, mean-loss) agg "
    "collects driver-side, budgets return as broadcast literals, and "
    "the cap is token_budget_cap's bucketed two-phase window — corpus "
    "text never shuffles.",
    "q_bitext_mine": "Margin bitext mining: both sides' IVF assignment "
    "AND l2 norms are narrow per-side projections (norms never recompute "
    "per pair), candidates meet in ONE list_id equi-join (broadcast "
    "while a side is small), and the four rank/average windows share "
    "per-key sorts — two exchanges (x_id, y_id), never |X|x|Y|.",
    "q_ngram_novelty": "N-gram novelty: reference shingle hashes "
    "BroadcastExchange into a marked left join over the corpus "
    "shingle stream; one per-doc HashAggregate — the only Exchange "
    "is the per-doc count, text never leaves the scan stage.",
    "q_rp_topk": "Random projection top-k: the projection is "
    "out_dim positional-dot expressions in the scan's codegen stage; "
    "cosine + TakeOrderedAndProject on the 8-dim vectors — same plan "
    "family as brute-force top-k at 1/8th the flops.",
    "q_curation_v2": "Composed curation chain: novelty's broadcast "
    "join, DoReMi's driver-literal budgets, and the A-ES keyed_rank "
    "stack in one DAG — each stage's exchanges are the standalone "
    "operator's; composition adds none.",
    "q_stream_image_dedup": "Stream-built visual hash store: the "
    "against-store probe over stream-appended rows is the batch plan "
    "verbatim — blobs decoded once in MapInPandas, 8-byte hash rows, "
    "chunk-bucket equi-join + ids-only anti-join.",
    "q_paragraph_semantic_dedup": "Paragraph-granularity SemDeDup: "
    "chunk keys are exact integer strides (one tiny max agg), pair "
    "generation is semantic_dedup's one bucket Exchange, and the "
    "per-doc rollup is a single integer-key HashAggregate + left "
    "join — the document decision adds no vector movement.",
    "q_semantic_dedup_against": "Incremental semantic dedup: new-month "
    "vectors meet the stored embeddings in ONE bucket equi-join (no "
    "unioned self-join re-pairing the past), the drop set is distinct "
    "ids, and the corpus returns via one anti-join.",
    "q_token_balanced_shards": "Equal-token sharding: the global "
    "running sum is an in-bucket Window plus broadcast literal prefix "
    "offsets from one bounded bucket-sum agg — no single-task global "
    "sort anywhere in the plan.",
    "q_image_near_dup_capped": "The DEPLOYED visual near-dup shape: "
    "blobs decode once in MapInPandas into 12-byte (id, hash) rows, "
    "one (chunk, value) Exchange, and the 2..256 window-count cap "
    "bounds every bucket before pair expansion — the plan a thumbnail "
    "flood meets in production.",
    "q_audio_near_dup_capped": "The deployed audio near-dup shape: "
    "fingerprints are pure codegen expressions (no Python), one "
    "token-keyed Exchange with the default 256 cap, set sizes ride "
    "the rows from BEFORE the cap.",
    "q_semantic_dedup_against_prod": "The deployed against-store "
    "semantic dedup: 4096 LSH buckets (planes=12) keep store-bucket "
    "populations at corpus/4096, the <=1024 seen-side window guard "
    "bounds the worst bucket, and the store join stays one bucket "
    "equi-join + ids-only anti-join.",
    "q_wet_roundtrip": "Crawl-source parse: binaryFile scan feeds one "
    "MapInPandas (file-granular parallelism, the reference framework's "
    "file-per-task model); downstream projection is ordinary Catalyst "
    "on the parsed columns.",
    "q_html_extract": "HTML extraction: one Arrow-batched scalar "
    "Python stage (ArrowEvalPython) over a pure projection — no "
    "shuffle, no join; the page never leaves the scan task.",
    "q_ngram_repetition": "Gopher n-gram signals: a single narrow "
    "projection of lambda-BOUND array expressions (each gram array "
    "materializes once per row) — no shuffle, no Python.",
    "q_image_phash_near_dup": "DCT pHash near-dup: same shape as the "
    "dHash family — blobs decode once in MapInPandas into 12-byte "
    "(id, hash64) rows (the integer DCT runs inside the decode "
    "stage), then chunk Generate, one (chunk, value) Exchange, "
    "bit_count verify; pixels never shuffle.",
    "q_winnow_fingerprints": "Winnowing: gram hashes and window "
    "minima are lambda-bound array expressions in ONE codegen "
    "projection over the scan — no shuffle, no Python; the explode "
    "emits (id, int, long) rows at ~2/(window+1) of gram volume.",
    "q_winnow_overlap": "MOSS overlap pairs: the winnowed projection "
    "feeds the proven token-set engine — distinct + two Window "
    "counts + materialize boundary + one fp-keyed self-join; the "
    "text never shuffles past the fingerprint projection.",
    "q_winnow_dedup_against": "Against-store winnow dedup: both "
    "months fingerprint in their scan stages, meet in ONE fp "
    "equi-join over (id, long) rows, per-id count, ids-only "
    "anti-join — the store side distinct-ed so duplicate hashes "
    "cannot double-count; text never shuffles.",
    "q_gopher_quality": "Gopher document rules: every signal and the "
    "composed keep flag are lambda-bound array/regexp expressions in "
    "one codegen projection over the scan — no shuffle, no Python "
    "(the UNBOUND form measured 54x/decade — SCALE.md r10).",
    "q_image_phash_letterbox": "Letterbox pHash: the strip + integer "
    "DCT both ride the decode MapInPandas stage; downstream is the "
    "unchanged 12-byte (chunk, value) Exchange shape.",
    "q_script_detect": "Script detection: the fractions struct is one "
    "lambda-bound projection computed ONCE; the dominant cascade "
    "derives from it in a second Project (compute-once-then-derive — "
    "the r10 7.6x double-eval fix; CollapseProject keeps the boundary "
    "because the struct is non-cheap and referenced six times). One "
    "round-robin exchange spreads the regex stage off the "
    "low-file-count scan; no Python.",
    "q_crawl_to_corpus": "Crawl front door composed: binaryFile WARC "
    "scan (parallelism unit = file; repartitioned off the low-file "
    "fixture) -> one straight-line per-row stage (HTTP slice, HTML "
    "extract mapInPandas, gated mojibake UDF, Gopher keep, PII "
    "regexps — no shuffle until dedup) -> exact-dedup key exchange -> "
    "materialize boundary (the corpus is consumed by band generation "
    "AND the anti-join return) -> one (band,key) exchange; text never "
    "travels in the near-dedup.",
    "q_stream_crawl_ingest": "Streaming crawl ingestion: stateless "
    "per-row curation on the binaryFile stream (no watermark, no state "
    "store — recovery is checkpoint replay), exactly-once parquet "
    "sink, then the batch splice dedup over the store (same "
    "materialize + (band,key) shape as the batch front door).",
    "q_main_content": "Main-content extraction: one Arrow pandas_udf "
    "over the page projection (same stage shape as q_html_extract); "
    "block scoring happens inside the single Python hop, no shuffle.",
    "q_jpeg_roundtrip": "JPEG codec roundtrip: encode+decode both ride "
    "one mapInPandas over the id scan; output is 5 tiny typed columns "
    "(the lossy contract: dims exact, error bounded), no shuffle.",
    "q_crawl_to_media": "Multimodal crawl front door: the content-type "
    "router is a JVM 256-byte prefix decode over the binaryFile scan "
    "(no Python touches the page decoys); image rows then pay ONE "
    "fused Arrow stage (HTTP body slice + magic sniff + decode + "
    "dHash — warc_image_dhash); the within-crawl near-dup and the "
    "against-store drop move 8-byte (media_id, hash) rows only, "
    "broadcast-joined back for the return. Bytes cross into Python "
    "once, hashes shuffle, pixels never do.",
    "q_jpeg_progressive": "Progressive JPEG cross-mode contract: "
    "encode(SOF0) + encode(SOF2) + both decodes ride one mapInPandas "
    "over the id scan (same stage shape as q_jpeg_roundtrip); output "
    "is 6 tiny typed columns, no shuffle.",
    "q_langid_ngram": "Char-n-gram LID: language profiles build from "
    "8 tiny rows, PIVOT to one 8-slot rank array per trigram, and "
    "BROADCAST; every language's contribution computes per doc-profile "
    "row in ONE projection and the per-doc distances are 8 sums keyed "
    "by doc_id — reusing the profile window's partitioning, so scoring "
    "adds NO exchange (the first formulation exploded x8 languages and "
    "measured 8.8x/decade); the winner is an array_min/array_position "
    "projection, not a window; the only data-sized shuffles are the "
    "two inside trigram_profile, with the rank<=k cut pushed into the "
    "exchange as WindowGroupLimit; no Python anywhere.",
    "q_lang_routed_curation": "Language-routed gate: the classifier "
    "plan + one doc_id equi-join back to the text + ONE "
    "BroadcastHashJoin routing each doc to its language's derived "
    "8-word stopword array + a codegen filter-count — routing adds no "
    "data-sized shuffle; the token array materializes once in its own "
    "projection (two sibling references — the r10 CSE lesson).",
    "q_crawl_interleaved": "Interleaved image-text corpus: the image "
    "half is the shared survivor chain (one fused Arrow decode stage, "
    "hash-only exchanges); the page half is JVM content-type routing + "
    "regexp ref extraction + one Arrow extraction stage, materialized "
    "before its two consumers; the re-attach moves (pos, ref) pairs "
    "through a left-semi join keyed by media id and one per-page "
    "aggregation — pixels and page bytes never meet the shuffle.",
    "q_edit_distance_near_dup": "Edit-distance near-dup: LSH candidate "
    "generation is the one (band,key) exchange (bucket-capped, never "
    "all-pairs); full text then travels ONLY for candidate ids in two "
    "equi-joins, and the verify is the JVM's banded-DP levenshtein "
    "(O(k·min(m,n)), -1 past the threshold) inside codegen.",
    "q_countmin_heavy": "Count-Min: the token stream collapses "
    "map-side into 4x64 cells (shuffle moves ≤256 rows per task at any "
    "corpus size); the estimate probe is a broadcast equi-join on a "
    "PRE-MATERIALIZED bucket column (never an expression-defined join "
    "key); the exact-count side is an ordinary wordcount + TakeOrdered "
    "that exists only to grade the sketch.",
    "q_quality_retention_curve": "Retention sweep: the corpus "
    "collapses to a ≤20-row bucket table in one map-side-combinable "
    "aggregation (integer-exact buckets); the 20-gate sweep is a "
    "broadcast range join on that tiny table — 20 thresholds for one "
    "corpus pass.",
}

def _lifecycle_dedup_stage(spark, sf):
    """The band-dedup stage INSIDE q_corpus_lifecycle (month 3 probing
    the compacted band store), rebuilt standalone: the registered query
    materializes this stage eagerly on the way to the final probe, so
    PLANS.md's q_corpus_lifecycle entry only ever showed the probe
    (VERDICT r9 #5). Here the store is written and the against-store
    DataFrame returned unexecuted, making the stage's scan pruning and
    exchange skeleton auditable."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

    d = q.load(spark, SF, "documents")

    def bands(df):
        return dedup.minhash_band_keys(
            dedup.minhash_signatures(df.select("doc_id", "text"),
                                     num_hashes=8, portable=True),
            num_hashes=8, bands=4, portable=True)

    bs = os.path.join(tempfile.mkdtemp(prefix="plan_audit_lc_"), "bs")
    dedup.write_band_store(bands(d.filter(F.col("doc_id") % 3 == 0)), bs)
    return dedup.minhash_dedup_against(
        d.filter(F.col("doc_id") % 3 == 2),
        dedup.read_band_store(spark, bs),
        num_hashes=8, bands=4, portable=True)


def _lifecycle_append_stage(spark, sf):
    """The stream-append stage inside q_corpus_lifecycle: a streaming
    sink can't be explained before start, but every micro-batch runs
    EXACTLY this batch projection (the shared ivf_quantized_codes)
    before its partitioned append — auditing the per-batch plan pins
    the stage (stream_append_ivf_quantized_store's apply body)."""
    from pyspark.sql import functions as F

    from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity

    e = q.load(spark, SF, "embeddings")
    cents = q._static_codebook(e)
    return similarity.ivf_quantized_codes(
        e.filter(F.col("vec_id") % 3 != 0), cents)


#: lifecycle SUB-STAGE audits (VERDICT r9 #5): plans that exist only
#: transiently inside a composed registered query, rebuilt standalone so
#: the audit can pin them. Keyed by a ::stage suffix on the parent name.
STAGE_AUDITS = {
    "q_corpus_lifecycle::band_dedup_stage": (
        "The lifecycle's month-vs-store fuzzy dedup: the store side "
        "scans ONLY (band, key) — no text, no signatures — the probe "
        "side shingles once, and the two meet in one (band, key) "
        "equi-join followed by an ids-only anti-join; nothing "
        "text-sized shuffles.",
        _lifecycle_dedup_stage),
    "q_corpus_lifecycle::stream_append_stage": (
        "The lifecycle's per-micro-batch append body (shared "
        "ivf_quantized_codes projection): nearest-centroid argmax and "
        "int8 quantization are pure codegen projections — no join, no "
        "exchange; the sink partitions by list_id so the appended rows "
        "land in the same pruned directories the batch writer builds.",
        _lifecycle_append_stage),
}

KEEP = re.compile(
    r"\(\d+\) (Scan parquet|Filter|Project|BroadcastExchange|BroadcastHashJoin|"
    r"SortMergeJoin|ShuffledHashJoin|Exchange|HashAggregate|Sort |Window|"
    r"TakeOrderedAndProject|ObjectHashAggregate|MapInPandas|MapInArrow|"
    r"PythonMapInArrow|ArrowEvalPython|Generate)"
)


def skeleton(plan: str) -> list[str]:
    lines = []
    for line in plan.splitlines():
        s = line.strip()
        if KEEP.search(s):
            lines.append(s)
        elif ("ReadSchema:" in s or "PushedFilters:" in s
              or "PartitionFilters:" in s):
            lines.append("    " + s[:160])
    return lines


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out = [
        "# PLANS — physical-plan audit (generated by scripts/audit_plans.py)",
        "",
        f"Spark {spark.version}, sf0.01 inputs, AQE on. Each skeleton lists the",
        "operator spine plus scan pruning lines; the note says why this is the",
        "plan we want at 100 TB.",
        "",
    ]
    for name, note in AUDITS.items():
        df = reg[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(mode)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Why this shape:** {note}")
        out.append("")
        out.append("```")
        out.extend(skeleton(plan))
        out.append("```")
        out.append("")
    for name, (note, builder) in STAGE_AUDITS.items():
        df = builder(spark, SF)
        plan = df._jdf.queryExecution().explainString(mode)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Why this shape:** {note}")
        out.append("")
        out.append("```")
        out.extend(skeleton(plan))
        out.append("```")
        out.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(AUDITS) + len(STAGE_AUDITS)} plans)")


if __name__ == "__main__":
    main()

import sys
sys.path.insert(0, "/root/repo")
from stonkwhisperer_spark.plans.registry import query_map
from stonkwhisperer_spark.session import get_spark

NOTES = {
    "pricing_summary": "Filter reaches the scan (PushedFilters on l_shipdate); map-side partial aggregation; one exchange.",
    "region_revenue": "Dim chain (customer x nation x region) collapses into broadcast exchanges; the only shuffle is the lineitem-orders equi-join key.",
    "ohlcv_1min": "Single hash shuffle on (minute, event_type); min_by/max_by/sum all have partial merges so the exchange carries one row per group per mapper.",
    "gapfill_events": "One hash partitioning on user_id; both fill directions are O(n) running frames (two in-partition sorts, no following-frame re-aggregation).",
    "near_dup_jaccard": "Pairs generated only through the shingle inverted-index self-join; shingle construction is codegen (posexplode + lead windows), never interpreted lambdas.",
    "minhash_band_candidates": "16 hash columns computed map-side with partial min aggregation; candidate join shuffles on (band_idx, band_key) only.",
    "asof_sentiment_bars": "As-of join via union + running window: one shuffle on the key, no range-join explosion.",
    "dedup_low_card": "Low-cardinality dedup avoids a per-key window: min-aggregate then broadcast semi-join.",
    "events_in_promo_windows_grid": "Interval-grid decomposition: the interval side explodes onto overlapped 5-min cells, points map to one cell, and the join is a pure equi-join on (event_type, cell) — no broadcast requirement, no nested loop on either side.",
    "knn_embeddings": "Scoring stays in WholeStageCodegen (dim-unrolled dot/norm, no interpreted array lambdas); query side broadcast; single per-query top-k window.",
    "zip_docs_embeddings": "J1 positional join: global row_number on both sides (single-partition sort by construction — parity surface; the scale path is the key-equi respec).",
    "cust_order_dist": "Q13 distribution: LEFT OUTER with the status predicate inside the join condition (a post-filter would drop zero-order customers); custkey shuffle then a tiny low-card rollup.",
    "idle_rich_customers": "Q22: scalar AVG threshold stays in-plan as a 1-row broadcast (no collect round trip); NOT EXISTS is a left-anti on custkey; nation broadcasts.",
    "part_value_share": "Q11 HAVING-vs-global-share: per-part frame cached so lineitem is scanned ONCE (exchange reuse does not fire across the threshold/rows branches); threshold joins back as a 1-row broadcast.",
    "steel_part_suppliers": "Q20 nested EXISTS chain planned inside-out: part filter broadcasts semi into lineitem, surviving suppkeys semi into supplier — no duplication, no distinct.",
    "ivf_topk_embeddings": "IVF ANN: centroids broadcast into a map-side scoring expansion, ONE partial-aggregated shuffle picks each vector's cell (max over a struct — no window sort), probe list broadcasts into a hash equi-join on cell.",
    "pack_documents": "Sequence packing: one shuffle on shard, O(n) running-sum frame per shard, pack ids derived map-side — no global sort, no cross-shard state.",
    "large_orders": "Q18 without the textbook re-join: the HAVING aggregate already holds the per-order quantity sum, so the plan is one lineitem aggregation broadcast into orders — one fact scan total.",
    "big_order_customers": "Q18 full form: the HAVING aggregate runs first (decimal-exact, one orderkey shuffle); the ~0.2% survivors drive the orders/customer joins, which AQE converts to broadcasts at this selectivity.",
    "sole_return_suppliers": "Q21 EXISTS/NOT-EXISTS decomposed to ONE per-order dual-distinct aggregation joined back to the returning lines — two orderkey shuffles instead of two correlated fact re-scans; supplier dim broadcasts.",
    "small_order_part_revenue": "Q17 correlated scalar subquery as join-vs-agg: one partkey shuffle builds the per-part (count, sum) frame, the fact joins against it, and the 20%-of-average cut is cross-multiplied so the filter is decimal-exact.",
    "benchmark_contamination": "Train/eval shingle overlap through the inverted index: doc-frequency cap filters hot shingles BEFORE the pair join; the join shuffles on shingle only, pair counts aggregate with partial merge.",
    "pii_scrub": "Pure map-only codegen: concat + two regexp_replace + two regexp_count in one WholeStageCodegen stage, zero exchanges.",
    "sql_top_brands_by_region": "spark.sql() text plans identically to the DataFrame twin: dim chain broadcasts under the fact scan, one (region, brand) agg shuffle, rank over the grouped output.",
    "bucketed_order_lineitem_join": "Bucketed co-located fact-fact join: both scans report Bucketed: true, SelectedBucketsCount 16/16, and the SortMergeJoin sits DIRECTLY on the scans — zero Exchange nodes below the join (the in-query assertion enforces this); only the tiny post-join priority rollup shuffles.",
    "doc_repetition": "Repetition scorer: split/sequence/transform/array_distinct all in one projection over the scan — map-only, no exchange; the interpreted HOF lambda is amortized by spread() input splitting.",
    "dedup_canonical": "Canonical selection: the iterative-CC output (tiny vs corpus) joins doc lengths, then one window on cluster_id ranks members — the only shuffles are on the clustered subset, never the full corpus.",
    "sentiment_closed_form": "Closed-form sentiment scoring: lexicon hit counts and the pinned-weight logit are one map-only codegen projection over the scan; the only exchange is the per-source ranking window (bounded partitions, never a global sort).",
    "revenue_rollup": "ROLLUP in ONE pass: the Expand node fans each row into its 3 grouping sets (region/nation/grand) INSIDE a single hash aggregate — partial aggregation still runs map-side, so the shuffle carries (#groups x #levels) partials, not the orders table; all dims broadcast.",
    "lineitem_status_cube": "CUBE over two low-card dims: Expand x4 grouping sets, one composite-key shuffle, no join; decimal sums keep the partial-merge order-free.",
    "sq8_topk_embeddings": "SQ8 ANN: quantize+dequantize+dot is one 64-term codegen projection per pair (no UDF, no interpreted lambdas); the 8 queries broadcast; one per-query top-k window. The candidate side reads 1 byte/dim when codes are materialized.",
    "bigram_familiarity": "Two bounded shuffles: posexplode+lead keyed on doc_id (sequence pairing stays in its partition group), then the bigram count/join keyed on (w1,w2) — vocabulary-sized, uniform; all counts are integer partials.",
    "doc_chunks": "Sliding-window chunking: sequence/slice/array_join/explode in one map-only codegen projection — zero exchanges; output is corpus x (1 + overlap/stride).",
    "dsir_sample": "DSIR selection: pass 1 is a map-side-combinable count keyed on 4096 hash buckets; pass 2 re-streams tokens against the BROADCAST affinity table (4096 rows) and aggregates per doc — the raw pool is streamed twice, never materialized.",
    "semantic_clusters": "Integer k-means: centroids are K-row broadcasts into a map-side argmin (partial-aggregated min over the dist*K+cid encoding); the update shuffle carries K x D integer partials; the 64-dim distance kernel is ONE codegen'd literal-indexed expression, no interpreted lambdas.",
    "semantic_dedup": "SemDeDup: candidate pairs generated per CLUSTER (join on the assignment key, never corpus x corpus); per-vector norms computed once before the pair join; dot and the integer cos^2 test are codegen'd unrolled expressions.",
    "near_dup_jaccard_prefix": "PPJoin-style exact join: the candidate self-join runs on PREFIX postings only (each doc's rarest n-ceil(0.8n)+1 shingles under the global df order), structurally excluding hot keys; verification joins full postings against the candidate set — O(candidates), hash-uniform shuffles throughout.",
    "bpe_merges": "Batched BPE training (r8): per pass ONE map-only pair extraction + one partial-aggregated count, batch selection as an in-plan aggregate fold over a bounded top-64 array (no driver round trip), and the whole batch applied in one unit-array fold with a 1-row-map broadcast — corpus passes scale as merges/B.",
    "bpe_encode": "Learn 2 batched passes then tokenize: merge application is one map-lookup fold per pass (batch broadcast as a map); the vocabulary-id window is single-partition over the BOUNDED vocab, re-joined to doc tokens as a broadcast; per-doc counting/ranking shuffle on uniform doc_id.",
    "pq_topk_embeddings": "PQ ANN: codebook train is broadcast(M*K)+map with an integer argmin encoded as min(dist*K+cid); codes join the |Q|*M*K broadcast distance table map-side; the per-(q,c) ADC sum is one partial-aggregated shuffle on uniform ids. Full-scan ADC by design — ivfpq_topk_embeddings is the pruned composition.",
    "txlog_merge_evolve": "MERGE schema evolution: the widened union schema is resolved driver-side from O(1) log metadata; the merge rewrites only files owning matched keys, and the evolved feed null-fills older files at scan time — no table rewrite, no full scan.",
    "ivfpq_topk_embeddings": "IVF x PQ composed: coarse centroids broadcast into the assignment argmax (one partial-agg shuffle), the probe list broadcasts INTO the assignment so the (q,c) candidate set exists map-side BEFORE any code is read; only the survivors' codes meet the broadcast ADC table, then one partial-aggregated sum — probes*avg_cell work per query instead of a linear scan.",
    "txlog_e2e_state": "Lifecycle relation: merges/compaction/vacuum are O(1) driver-side log I/O + bounded writes; the CDC feed opens only each commit's added files (one scan node per commit, never a table scan); the result is a 240-row collected relation.",
    "curation_e2e": "Composed curation: the shingle chain is ONE corpus pass shared through the grouped-jaccard ReusedExchange; CC rounds fold their checkpoint into the convergence agg (one job per round); the kill anti-join and 2048-token packing shuffle the survivor subset on uniform keys; quality regexes run behind spread() so scan layout never serializes them, and the survivor gate is pinned ABOVE its exchange by the no_pushdown guard (pushed, the multi-regex argmax ran single-tasked in the scan).",
    "incremental_dedup": "Batch-vs-corpus dedup: ONE grouped pass yields signatures and shingle counts; the candidate join shuffles on (band_idx, band_key) with each side reduced to 4 band rows per doc; exact-Jaccard verification re-reads postings only join-pruned to candidate docs — incoming docs are never self-compared, so a daily batch costs O(batch), not O(corpus).",
    "ivfpq_refine_embeddings": "IVFPQ + Refine: the composed coarse-prune x ADC chain yields a 4k-per-query shortlist, which BROADCASTS into one quantized-vector map pass over the corpus (no shuffle); the exact 64-dim integer rescore and per-query re-rank touch rf*k rows per query — at 1e9 vectors the refine reads 20 raw vectors per query, not 1e9.",
    "kmv_vocab_cardinality": "Per-source KMV sketches: one (source, hash) shuffle with partial-aggregated distinct, per-source top-K via a partitioned window over K-bounded groups; the <all> row is a MERGE of the per-source sketches (K x sources rows re-ranked) — the corpus is never re-read for the global estimate.",
    "cms_token_topk": "Count-Min table: map-side partial counts cap the shuffle at d*w rows per mapper regardless of corpus size; point estimates join the d-row-selected sketch back as d broadcast hash joins (zero added shuffles on the probe side); the final top-20 plans as TakeOrderedAndProject, not a global sort.",
    "event_type_enrich_sketch_salted": "Sketch-guided skew join: the CMS probe + 1-row threshold pick hot keys behind a checkpoint (one evaluation for both join sides); only hot fact rows spread over 16 salts and only hot dim keys replicate 16x — the cold long tail joins with ZERO replication, vs the blanket 16x dim explosion of event_type_enrich_salted.",
    "media_resize_stats": "Full multimodal normalize chain: encode -> decode (CRCs, unfiltering) -> nearest-neighbor resize -> per-channel means as three Arrow-batched mapInPandas stages over the doc_id scan — zero exchanges; resize output is a constant 96 bytes/row so downstream partition sizing is exact regardless of source dimensions.",
    "priority_sample": "Weighted priority sampling: the int64 priority ((w << 31) DIV h) is one codegen projection over the scan and the k=500 cut plans as TakeOrderedAndProject — per-partition partial top-k, a k-row driver merge, ZERO exchanges and no global sort; 100 TB costs one scan.",
    "zip_docs_embeddings_dist": "J1 positional zip, scale form: per side one range shuffle into a checkpointed layout, a uniform _pid hash shuffle for the local rank window, and a <=32-row offsets broadcast; the final pairing is one hash equi-join on the dense rank — NO single-partition sort anywhere (contrast zip_docs_embeddings, the parity baseline).",
    "video_frame_stats": "Real frame sampling: encode -> chunk-walk container split -> every-2nd-frame decode -> per-frame means as mapInPandas stages; sample-then-decode means only kept frames pay decode, and the (media, frame) repartition before featurize is the long-video skew fix — decode parallelism is per-frame, not per-video.",
    "quantile_sketch_prices": "Mergeable quantile summary: one hash shuffle on 64 buckets with a bounded per-bucket sort builds the B*k weighted sample; the rank-scan window is unpartitioned but over the 4096-row SKETCH, never the corpus; the truth pass joins the corpus against a 3-row broadcast.",
    "url_canonical_dedup": "Canonical-URL dedup: the whole canonicalization (regex extracts, param filter/sort) is one map-only projection; the group-by shuffles ONCE on the canonical key — the same profile as the raw-key anti-join it replaces.",
    "audio_pcm_stats":"Real audio leg: WAV encode -> RIFF chunk-walk decode -> integer PCM stats PLUS framewise energy/zero-cross features in the same single decode pass, as two Arrow-batched mapInPandas stages over the doc_id scan — zero exchanges; features are O(duration) per clip, size_bucket is the skew lever for mixed clip lengths.",
    "bloom_prune_lineitem": "Bloom semi-join prune: the build side explodes d=4 bits/key map-side and bit_or partial-aggregates into <=4096 packed words (ONE word-keyed shuffle bounded by m/32 rows per mapper); probing is d broadcast hash-joins + codegen bit tests adding ZERO shuffles to the fact scan — the exact-membership join is the self-check, not the production path.",
    "jsonl_ingest_roundtrip": "JSONL landing round trip: to_json write and schema-on-read parse are both map-only (one part-file per task, no coordination); PERMISSIVE corrupt-record routing is a codegen CASE over the parse, and the only exchange is the final per-language agg.",
    "kmv_shard_overlap": "KMV set operations: one (shard, hash)-keyed sketch pass over the corpus; union/intersection/difference estimates are joins over the <=K-row sketches assembled via four 1-row broadcast slices — the corpus is read once for the sketch and once for the exact self-check, never for the estimates.",
    "hll_vocab_cardinality":"Per-source HyperLogLog: rank registers aggregate with map-side max partials keyed on (source, bucket) — at most m=256 rows per source cross the wire per mapper; the <all> row is an element-wise max MERGE of the per-source register tables (m x sources rows), never a corpus re-read; estimator arithmetic is one integer division per group.",
    "ivfsq8_topk_embeddings": "IVF x SQ8 composed: the probe list broadcasts into the coarse assignment so the probes*avg_cell candidate set exists BEFORE any scoring expression runs; only survivors pay the 64-term dequant-dot (codegen, fixed fold order) — pruning lever + 4x memory lever at once, vs sq8_topk's linear ADC scan.",
}

spark = get_spark(app_name="plans", cpus="8")
sf = "/root/testdata/sf0.01"
qmap = query_map()
out = ["# Physical plan evidence (sf0.01, local[8])", "",
       "Generated with `df.explain('formatted')`. Regenerate: `python docs/gen_plans.py`.", ""]
for name, note in NOTES.items():
    df = qmap[name](spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # keep the operator tree, drop the verbose per-node details
    tree = plan.split("\n\n")[0]
    out += [f"## {name}", "", note, "", "```", tree, "```", ""]
spark.stop()
open("/root/repo/docs/PLANS.md", "w").write("\n".join(out))
print("written", len("\n".join(out)))

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling regression probe (NOT part of the driver contract, NOT a
  * correctness input): times headline queries at sf0.1 and at a synthetic
  * ×`factor` replica of the same tables, to catch super-linear (quadratic)
  * creep early — the check VERDICT r1 asked for, since no sf1 parquet is
  * provided in /root/testdata.
  *
  * The replica is derived mechanically from the driver's own sf0.1 tables
  * (id-shifted unions — same value distributions, ×factor cardinality) and
  * lives under /tmp; it is used for TIMING ONLY, never for correctness
  * comparison. Run: `sbt "runMain graft.ScalingProbe"`; results → SCALING.md.
  */
object ScalingProbe {

  private val Offset = 1000000000L

  private def replicate(spark: SparkSession, baseDir: String, outDir: String,
                        factor: Int): Unit = {
    val shifts = Map(
      "lineitem" -> Seq("l_orderkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "documents" -> Seq("doc_id"),
      // id-shift only, SAME time range: ×factor events in the same 30 days,
      // so event density — and with it every range-join window's occupancy —
      // grows ×factor. The adversarial regime for q87, analogous to what
      // id-shift does to shingle df.
      "events" -> Seq("event_id"),
      // id-shift only, SAME nation/balance distributions: ×factor customers
      // deepen every (nation, balance-bucket) blocking cell ×factor — the
      // adversarial regime for blocked entity resolution (q181)
      "customer" -> Seq("c_custkey"),
      // id-shift only: ×factor vectors, SAME embedding space — cluster
      // populations grow ×factor, the adversarial regime for intra-cluster
      // pair search (q95)
      "embeddings" -> Seq("vec_id"))
    shifts.foreach { case (table, keys) =>
      val path = s"$outDir/$table.parquet"
      if (!new java.io.File(path).exists()) {
        val base = graft.sources.Tables(spark, baseDir, table)
        val copies = (0 until factor).map { i =>
          keys.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * Offset)))
        }
        copies.reduce(_ union _).write.mode("overwrite").parquet(path)
      }
    }
  }

  /** The realistic-corpus regime: ×factor documents whose VOCABULARY also
    * grows ×factor (each copy suffixes every whitespace token with its copy
    * index, so copies share no shingles and per-shingle document frequency
    * stays at its base value instead of growing with N — which is how real
    * web corpora behave, per-shingle df bounded while N grows). The id-shift
    * replica above is the opposite, deliberately degenerate regime: constant
    * 31-word vocabulary, so every shingle's df grows ×factor and uncapped
    * bucket joins go quadratic. Measuring BOTH regimes is what SCALING.md
    * needs to claim near-linearity honestly. */
  private def replicateVocabGrow(spark: SparkSession, baseDir: String, outDir: String,
                                 factor: Int): Unit = {
    val path = s"$outDir/documents.parquet"
    if (!new java.io.File(path).exists()) {
      val base = graft.sources.Tables(spark, baseDir, "documents")
      val copies = (0 until factor).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * Offset))
          .withColumn("text",
            array_join(transform(split(col("text"), " "), t => concat(t, lit(s"v$i"))), " "))
      }
      copies.reduce(_ union _).write.mode("overwrite").parquet(path)
    }
    // the realistic events regime, analogous to vocabgrow for text: each copy
    // is time-shifted onto its own disjoint 35-day span, so the corpus grows
    // as LONGER HISTORY at constant density — window occupancy stays at its
    // base value while anchor count grows ×factor
    val evPath = s"$outDir/events.parquet"
    if (!new java.io.File(evPath).exists()) {
      val base = graft.sources.Tables(spark, baseDir, "events")
      val copies = (0 until factor).map { i =>
        base.withColumn("event_id", col("event_id") + lit(i * Offset))
          .withColumn("ts", expr(s"ts + INTERVAL ${i * 35} DAYS"))
      }
      copies.reduce(_ union _).write.mode("overwrite").parquet(evPath)
    }
    // the realistic embeddings regime: each copy TRANSLATED to its own
    // region of the space (+20·i per coordinate — far beyond the data's
    // unit-ish scale), so the corpus grows as MORE structure at constant
    // local population — the complement of id-shift's same-space deepening
    // (which multiplies every cluster/bucket population ×factor)
    val embPath = s"$outDir/embeddings.parquet"
    if (!new java.io.File(embPath).exists()) {
      val base = graft.sources.Tables(spark, baseDir, "embeddings")
      val copies = (0 until factor).map { i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * Offset))
          .withColumn("embedding",
            transform(col("embedding"), x => x + lit((i * 20).toFloat)))
      }
      copies.reduce(_ union _).write.mode("overwrite").parquet(embPath)
    }
    // the realistic orders regime (q148's second regime): each copy
    // time-shifted onto its own disjoint 7-year era, so the mart grows as
    // LONGER HISTORY — the 1995/1996 comparison windows keep their base
    // population while the scan grows ×factor (the events time-shift
    // story on the relational mart)
    val ordPath = s"$outDir/orders.parquet"
    if (!new java.io.File(ordPath).exists()) {
      val base = graft.sources.Tables(spark, baseDir, "orders")
      val copies = (0 until factor).map { i =>
        base.withColumn("o_orderkey", col("o_orderkey") + lit(i * Offset))
          .withColumn("o_custkey", col("o_custkey") + lit(i * Offset))
          .withColumn("o_orderdate", expr(s"o_orderdate + INTERVAL ${i * 7 * 365} DAYS"))
      }
      copies.reduce(_ union _).write.mode("overwrite").parquet(ordPath)
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    // factor + base are part of the path: a re-run with different parameters
    // must never silently reuse a stale replica
    val outDir = args.lift(2).getOrElse(
      s"/tmp/graft_scale_probe_${new java.io.File(baseDir).getName}_x$factor")
    val vgDir = s"${outDir}_vocabgrow"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    replicate(spark, baseDir, outDir, factor)
    replicateVocabGrow(spark, baseDir, vgDir, factor)

    // Optional subset for local iteration (SPARK_GRAFT_PROBE_ONLY=q34_...)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val probeQueries = Seq("q01_pricing_agg", "q04_fact_join", "q22_doc_vectors",
      "q25_pagerank", "q33_ngram_jaccard_pairs", "q34_minhash_lsh_pairs",
      "q35_simhash_pairs", "q63_edit_blocked",
      // round-5 curation family (VERDICT r5 Next #1): the iterative
      // clustering chain (CC rounds × joins), the broadcast-overlap
      // decontamination, and the explicitly-uncapped span-df shuffle
      "q70_dup_clusters", "q72_dedup_purge", "q73_decontamination",
      "q76_dup_spans", "q79_bpe_train", "q80_bpe_encode",
      // round-6 additions: the binned range join (density regime vs
      // longer-history regime), the asymmetric-probe incremental dedup, and
      // the fixed-memory heavy-hitters sketch vs its corpus-sized exact side
      "q87_range_join_windows", "q88_incremental_dedup", "q89_heavy_hitters",
      "q90_charlm_ppl",
      // the C4 line-dedup pass (hot boilerplate lines are the skew case) and
      // the Bloom probe (pure row work — its ratio IS the scan ratio)
      "q91_line_dedup", "q92_bloom_decontam",
      // the scale-technique joins: q93's id-shift replica is its adversarial
      // regime by construction (×10 rows on the SAME five event_type keys —
      // exactly the hot-key density salting exists for); q94's orderkey
      // shifts are consistent across fact and dim, so the join scales
      // linearly and the probe watches the Bloom build + prune overhead
      "q93_salted_join", "q94_bloom_join",
      // semantic dedup at the catalog's FIXED k=8: ×factor vectors deepen
      // every cluster ×factor, so intra-cluster pair search is the
      // quadratic regime by construction (the operator's documented
      // contract). The k∝n scale path is measured separately below.
      "q95_semantic_dedup",
      // logistic-regression train+score+gate: per GD round one n×d
      // posexplode shuffle into d keys — should scale like the scan in
      // BOTH regimes (the weight vector is feature-count-bounded and the
      // gradient aggregate map-side-combines)
      "q97_lr_filter",
      // embedding decontamination: the bench side stays eval-suite-sized
      // under id-shift (bench ∩ shifted copies grows, but the broadcast is
      // 1/25 of the corpus — the probe watches that it stays a broadcast)
      // and the per-doc best match is one partial-aggregated pass
      "q99_embedding_decontam",
      // the composed curation pass: per-row chain + one content-keyed
      // shuffle whose hot key (the injected boilerplate flood) grows
      // ×factor under id-shift — partial aggregation must absorb it
      "q100_curation_e2e",
      // mixture rebalance: a source census + per-row coin — the ratio
      // should be the scan ratio (id-shift multiplies every source count
      // ×factor, rates come out identical)
      "q98_mix_rebalance",
      // within-doc repetition purge: row-local array_distinct, zero
      // shuffles — the ratio IS the scan ratio in both regimes
      "q102_doc_repetition_purge",
      // LSA power iteration: per round two cell-table equi-shuffles — the
      // cell count is what grows; vocabgrow also multiplies the vector
      // frame ×10 (never broadcast, so it only widens the shuffle)
      "q103_lsa_component",
      // quantized-cosine fidelity report: per-row quantization + the q36
      // capped within-label pair join — id-shift deepens label blocks
      // ×factor, so like q36 the pair term is quadratic-in-factor below
      // the cap; the cap is the declared work bound
      "q101_quantized_cosine",
      // round-7 additions. Triangle counting: id-shift keeps the DISTINCT
      // co-occurrence edge set constant (same 31-term vocab) while the
      // pre-distinct pair volume grows ×factor; vocabgrow is 10 disjoint
      // graph replicas — the wedge join (the skew-prone stage) is probed
      // in both
      "q104_triangle_counts",
      // the deflation loops: q105 runs the phase loop twice, q109 three
      // times, each round two cell-table equi-shuffles + vocab-keyed
      // deflation joins — ratios should track q103's (the memo is cleared
      // per measurement, so each probes the FULL factorization)
      "q105_lsa_second", "q109_lsa_topk",
      // ordered funnel: three user-keyed min-aggregates + filtered
      // re-joins; id-shift multiplies events per user-stage, vocabgrow's
      // longer-history replica multiplies users — both should scan-scale
      "q106_funnel",
      // k-means summary: per round one k×d broadcast + one n×d shuffle —
      // id-shift deepens every cluster ×factor, the ratio should stay the
      // shuffle ratio (no pair term anywhere)
      "q110_kmeans_clusters",
      // exact-quota sample: scan + bounded-heap TopK — shuffle volume is
      // quota·|strata| CONSTANT in corpus size, so the ratio is the scan
      "q111_sample_quota",
      // MinHash dedup end to end: q34's pair generation + O(log n) CC
      // rounds + purge — the composed chain must keep q34's/q70's
      // sub-linearity in both regimes
      "q112_minhash_cluster_purge",
      // k-core peel: per round one degree count + two semi joins; id-shift
      // multiplies edge MULTIPLICITY pre-distinct only, vocabgrow gives 10
      // disjoint replicas (peel depth unchanged — rounds are depth-bound,
      // not size-bound)
      "q114_kcore",
      // Adamic-Adar: the capped wedge join (deg² per common neighbor below
      // the cap) + an anti join — the q33 cost shape on the graph side
      "q115_adamic_adar",
      // the event-mart trio: single-shuffle grouped aggregates (rollup
      // expands grouping sets map-side; retention's user-day distinct is
      // the only wide stage; anomaly is hour-keyed + a 1-row broadcast) —
      // ratios should track the scan in both regimes
      "q107_retention", "q108_rollup", "q113_anomaly",
      // PCA: the corpus-sized stage is the row-local d² product generation
      // collapsed map-side (the exchange carries d² partials per
      // partition); the iteration runs on d-/d²-row frames — the ratio is
      // the covariance scan. q117 adds one d-row broadcast over the corpus
      "q116_pca_component", "q117_pca_scores",
      // PMI: two vocab-keyed joins on the co-occurrence aggregate;
      // LSA doc scores: the q103 loop + one term-keyed join — both should
      // track their parents' ratios
      "q118_pmi", "q119_lsa_doc_scores",
      // BPE roundtrip: the q80 train+encode chain + a per-row comparison.
      // (q121 personalized PageRank is NOT probed: its input is the
      // 30-vertex nation fixture — not replicated, and structurally q81's
      // already-measured shape with a seed-gated teleport)
      "q120_bpe_roundtrip",
      // weighted sampling: tokenize + per-row key + the bounded heap —
      // the ratio is the scan ratio (≤100 rows ever reach the shuffle)
      "q122_weighted_sample",
      // round-8: dense top-k by deflation — component 2's loop adds only
      // d-/k·d-row deflation joins on top of q116's covariance scan, so
      // the ratio should track q116's (the memo is cleared per
      // measurement, so each probe pays the FULL two-component solve)
      "q123_pca_topk",
      // BFS hops: per round one frontier⋈adjacency equi join + a grouped
      // min — the k-core cost shape with a monotone distance table
      "q127_bfs_hops",
      // Count-Min: the tokenize scan + a vocab-keyed count + the d·w-cell
      // grouped sum — state is corpus-independent, the ratio is the scan
      "q128_countmin",
      // portable HLL: hash scan + a ≤64-register grouped max per group —
      // the same corpus-independent-state shape; the exact side is the
      // honesty check (q89's stance)
      "q129_hll_portable",
      // JL projection: the n·d explode × broadcast signs collapses
      // map-side to n·16 — linear by construction; the ratio is the scan.
      // (q131 RRF is NOT probed in catalog form: both input rankings use
      // the corpus-growing vec_id%20 query set — q37's unprobed-baseline
      // reasoning; its per-query scale path is q125's opscaled probe.)
      "q130_random_projection",
      // stupid backoff: two Heaps-bounded model counts + three vocab-keyed
      // scoring joins — the q90 char-LM cost shape at word granularity
      "q132_stupid_backoff",
      // z-order layout: per-row bit interleave + ONE cell-keyed aggregate
      // — pure scan shape; the cell table is ≤ 2^12 rows
      "q133_zorder_layout",
      // PQ training+encode: grouped Lloyd's is one n·d shuffle per round
      // regardless of subspace count — the ratio is the k-means scan
      // ratio. (q125/q126 are NOT probed in catalog form: their query set
      // is vec_id%20, which grows WITH the corpus — |q|·n pairs is
      // quadratic by construction, the same reason q37 brute is the
      // unprobed baseline. The per-query search cost is probed below with
      // a FIXED query set.)
      "q124_pq_codes",
      // round-8 additions. HITS: two equi-shuffle join+sum passes per
      // round over the DISTINCT bigram digraph — id-shift leaves the graph
      // constant (pre-distinct volume grows), vocabgrow gives 10 disjoint
      // replicas at the same iteration count
      "q134_hits",
      // DSIR: feature explode scan + two B-row model counts + a broadcast
      // scoring join — B is corpus-independent, so the ratio is the scan;
      // the resample adds only the bounded heap on top
      "q135_dsir_weights", "q136_dsir_resample",
      // KMV set ops: one distinct + one grouped-flag pass; everything
      // downstream is k-bounded (the heap + a 256-row broadcast) —
      // id-shift leaves distinct (user,day) constant (event_id shifts
      // only), the time-shift replica grows it ×factor
      "q137_kmv_setops",
      // TextRank: row-local window pairs (scan) + the Heaps-bounded edge
      // count + 10 broadcast-rank rounds on the cached edge table
      "q138_textrank",
      // SCD2 intervals: one (user,day,type) count + two user-partitioned
      // windows — rows per window partition are calendar-bounded
      "q139_scd2_intervals",
      // EWMA: the q56 dense grid × a 24-row broadcast offset table — one
      // (type, hour)-keyed join + grouped DECIMAL fold, no window
      "q140_ewma",
      // unigram LM: the corpus is touched once (word counts); everything
      // after is Heaps-bounded word-keyed work with the DP row-local —
      // id-shift leaves the word table CONSTANT, vocabgrow ×10s it
      "q141_unigram_train", "q142_unigram_encode",
      // basket rules: row-local pair explode from tiny baskets + one pair
      // count; lift arithmetic on broadcast singles
      "q143_basket_rules",
      // IVM merge: two partial aggregations + one partial-keyed merge —
      // the shuffle carries hour-bucket partials, never raw events
      "q144_incremental_agg",
      // soft-EM unigram: the q141 shape with forward-backward HOFs in
      // place of the Viterbi — still one corpus scan + word-keyed frames
      "q145_unigram_em",
      // nearest-centroid: one grouped mean + a |labels|-row broadcast over
      // the test scan — id-shift deepens labels at constant |labels|,
      // translate moves clusters at constant population
      "q146_centroid_classify",
      // Bellman-Ford: per round one dist⋈adjacency join + a grouped
      // integer MIN — the bfsHops shape with a cost column
      "q147_shortest_paths",
      // snapshot diff: two partial aggregations + one customer-keyed
      // full outer join of the partials
      "q148_snapshot_diff",
      // modularity: one distinct + two label joins + three grouped counts
      "q149_modularity",
      // trend slopes / chi-square: one (or two) grouped integer-sufficient-
      // statistic passes — pure scan shapes
      "q150_trend_slopes", "q151_chi_square",
      // prefix filtering: id-shift is the true-duplicate flood — ×10
      // copies of every doc make the OUTPUT pair set itself quadratic
      // (the q33/q36 contract); vocabgrow is the regime the prefix
      // bound actually addresses (disjoint vocab, linear)
      "q152_prefix_jaccard",
      // MMR: everything after the bounded-heap shortlist is (|q|·20)-bounded
      "q153_mmr_rerank",
      // PSI / calibration: fixed-grid grouped passes — pure scan shapes
      "q154_psi_drift", "q155_lr_calibration",
      // clustering coefficient: the q104 wedge machinery + a degree join;
      // RAKE: per-doc bounded windows + two Heaps-bounded grouped passes
      "q156_clustering_coeff", "q157_rake_keyphrases",
      // burstiness: per-user windows + integer moments; zipf: Heaps-bounded
      // frequency table + the two-phase rank + a 1-row regression
      "q158_burstiness", "q159_zipf_fit",
      // confusion matrix / entropy: one or two grouped passes — scan shapes
      "q160_langid_confusion", "q161_type_entropy",
      // unigram ids: the q141 chain + one posexplode scan + two
      // piece-keyed joins — tracks its tokenizer parent
      "q162_unigram_ids",
      // data card: one tokenize scan + a content-hash census + a
      // source-keyed rollup — scan-shaped
      "q163_data_card",
      // IVF-PQ: the catalog query set grows with the corpus (the q125
      // reasoning), but the probe still evidences the by-cell join: codes
      // scanned per query shrink to ~nprobe/kCoarse of the index
      "q164_ivfpq_topk",
      // centroid distances: one grouped mean + a |labels|^2-bounded join
      "q165_centroid_dists",
      // IVFADC+R: the q164 chain + a shortlist-bounded true-L2 join;
      // latency cohorts / reciprocity: grouped passes + one semi join
      "q166_ivfpq_rerank", "q167_conversion_latency", "q168_reciprocity",
      // assortativity: the q104-family edge/degree passes + a 1-row stat
      "q169_assortativity",
      // spell suggest: Heaps-bounded vocab frames + a length-banded join
      "q170_spell_suggest",
      // k-truss: per round one triangle enumeration (m^1.5 wedge join) +
      // an edge-keyed support count — depth-bounded like q114
      "q171_ktruss",
      // Markov transitions: per-user ordered lags + a |types|^2 cell count
      "q172_markov_transitions",
      // item CF: user-keyed inverted-index pair join over |items|-bounded
      // sets + a per-item neighbor window
      "q173_item_cf",
      // RFM: one user-keyed grouped pass + a 27-cell rollup
      "q174_rfm_segments",
      // composed pretraining capstone: six already-probed stages in ONE
      // plan (MinHash dedup → decontam → ppl gate → rebalance → tokenize →
      // pack) — the ratio should track the sum of its stage ratios
      "q175_pretrain_pipeline",
      // hashed-feature classifier: per GD round one n·(B+1) shuffle
      // map-side combined onto 257 cells — both regimes should scan-scale
      // (vocabgrow grows the hashed bigram stream linearly too)
      "q176_hashed_lr_filter",
      // image aHash dedup: per-partition encode+decode+hash scan, then 4
      // band equi joins on the n-row hash frame — id-shift multiplies
      // near-dup groups ×factor (group structure is doc_id-arithmetic, so
      // each copy carries its own groups); text is unused, so the
      // vocabgrow replica would measure the identical plan — id-shift only
      "q177_image_ahash_dedup",
      // closed-form OLS: one tokenize scan + nine map-side-combined sums
      // into a 1-row solve — the ratio IS the scan ratio in both regimes
      "q178_ols_normal_eq",
      // curriculum manifest: one (phase, shard)-partitioned window over
      // the scan — the ratio IS the scan ratio in both regimes
      "q182_curriculum_order",
      // shared passages: df-capped positional gram join + (pair, diagonal)
      // windows — id-shift multiplies df per gram (the q76 regime),
      // vocabgrow holds df at base while positions grow ×10
      "q183_shared_passages",
      // quality rule bundle: one (doc, term) count + one per-doc rollup —
      // scan-shaped in both regimes
      "q184_quality_rules",
      // source leakage: map-side distinct to (source, shingle) — id-shift
      // grows the per-(source, shingle) pre-distinct volume, vocabgrow
      // grows the shingle space itself; output stays |sources|²
      "q185_source_leakage",
      // CDC chunking: doc-bounded prefix sums + fingerprint census — the
      // ratio is the scan ratio; id-shift multiplies chunk df (more dup
      // mass), vocabgrow keeps df at base
      "q186_cdc_chunks",
      // containment pairs: the q33 join shape with per-side divisions —
      // same cap-bounded regimes as q33
      "q187_containment_pairs",
      // tokenizer eval: the three benched trainers + word-frame
      // aggregates — the ratio tracks the trainer family's (near-flat
      // id-shift, Heaps-bounded vocabgrow)
      "q188_tokenizer_eval",
      // incremental image probe + multimodal capstone: band joins + narrow
      // per-partition decode/resize maps — text unused, id-shift only
      // (the q177 reasoning)
      "q189_incremental_image_dedup", "q190_multimodal_pipeline",
      // soft dedup: q70's CC chain + one cluster-keyed count — ratios
      // track q70's
      "q191_soft_dedup_weights",
      // accuracy CI: the q31 NB chain + a 64x explosion of the
      // eval-suite-sized scored frame — the ratio is the NB train ratio
      "q192_accuracy_ci",
      // worst-group report: the q31 chain + a |groups|-sized fold
      "q193_worst_group",
      // per-source card: one tokenize scan, |sources|-row rollup —
      // scan-shaped in both regimes
      "q194_source_quality_card",
      // entity resolution: blocked pair join — id-shift deepens every
      // (nation, balance-bucket) cell ×factor, so the pair term is the
      // watched quantity (the q33 uncapped-block regime on records);
      // fixture dups ride along (custkey%10 preserved mod 1e9 shifts)
      "q181_entity_resolution",
      // WordPiece trainer: the q79 loop + one extra Heaps-bounded census
      // shuffle per round — ratios should track q79's
      "q180_wordpiece_train",
      // hard-negative mining: anchors×corpus broadcast kernel through the
      // bounded-heap TopK — the catalog anchor set grows with the corpus
      // (the q37 caveat); at 100 TB anchors are a fixed minibatch and the
      // corpus routes through IVF/PQ
      "q179_hard_negatives",
      // round-10 additions. q197 retrieval eval: the brute-truth kernel is
      // quadratic-in-corpus by design (every vector is a query — the q37
      // caveat at full strength); at 100 TB the eval runs on a fixed query
      // sample. q198: one tokenize scan + a |sources|-row rollup — the
      // ratio is the scan ratio. q199: broadcast benchmark-gram probe —
      // scan-scales; vocabgrow multiplies the gram space. q200: bounded
      // anchors (2 %) × corpus broadcast kernel — anchors grow with the
      // corpus in catalog form (the q179 caveat), minibatch-fixed at scale
      "q197_retrieval_eval", "q198_data_budget",
      "q199_exact_ngram_decontam", "q200_triplet_mining",
      // round-11 additions (all embeddings-based — id-shift replica only,
      // the q177/q197 rule). q207: IVF-PQ system side probes ~nprobe/kCoarse
      // of the index per query, but its truth side is |sample|·n and the
      // catalog query sample (%100) grows with the corpus — expect the q164
      // shape plus a linear truth term. q208: THE fixed-panel counterpoint
      // to q197 — 64 bottom-by-hash queries at ANY corpus size, so the
      // truth kernel is 64·n and the ratio should read near-linear where
      // q197's honest row reads ~12×. q209: q200's kernel with the fixed
      // 64-anchor panel — 64·n vs q200's growing %-residue anchors
      "q207_ivfpq_retrieval_eval", "q208_retrieval_eval_sampled",
      "q209_triplet_mining_sampled",
      // q201: one tokenize scan + hash-keyed dedup window — scan-scales;
      // q202: one scan + (lang, shard)-partitioned window — scan-scales
      "q201_attrition_funnel", "q202_packing_efficiency",
      // q203: the q90 trigram chain + a census-sized window; q204: the
      // same chain + one 2x2 rollup — both should track q90's scan ratio
      "q203_signal_auc", "q204_gate_agreement",
      // q205: one tokenize scan + census-grid windows (sources × distinct
      // token counts — value-bounded); q206: one coin scan + a
      // |splits|·|sources| rollup — the ratio IS the scan ratio
      "q205_ks_drift", "q206_split_manifest",
      // round-12 additions. q210 ExactSubstr coverage: one positional-gram
      // scan + a gram-keyed df groupBy + an equi back-join + doc-keyed
      // windows — no pair term, so BOTH regimes should scan-scale (id-shift
      // multiplies df per gram at constant gram space; vocabgrow grows the
      // gram space at df ≈ base). q211 winnowing: the q33 join shape on a
      // stream pre-thinned to ~2/(w+1) — id-shift is the duplicate-flood
      // regime (×factor docs share every fingerprint, the OUTPUT pair set
      // grows quadratically, the q33/q152 contract); vocabgrow is the
      // disjoint-vocab regime the density bound addresses
      "q210_duplicated_spans", "q211_winnowing_overlap",
      // round-12 session-2 additions. q212 Kneser-Ney: q132's exact shape
      // (row-local bigrams, Heaps-bounded model, vocab-keyed joins) plus
      // three re-aggregations of the bigram-TYPE frame — ratio should
      // track q132's in both regimes. q213 blocklist scan: plan-time
      // automaton, zero shuffle beyond |phrases| partials — the ratio IS
      // the scan ratio (id-shift multiplies hits per phrase; vocabgrow
      // suffixes kill most hits — both stay scans). q214 self-BLEU: fixed
      // 64-doc panel → panel·n gram joins (broadcast ref maxima), no pair
      // term in either regime. q215 CCNet buckets: the q90 chain + a
      // 768-row panel fit + one broadcast threshold join — should track
      // q90. q216 char entropy: pure row-local array math, the scan ratio
      // by construction.
      "q212_kneser_ney", "q213_blocklist_scan", "q214_self_bleu",
      "q215_ccnet_buckets", "q216_char_entropy",
      // q217 vocab coverage: Heaps-bounded census + global top-4096
      // (TakeOrderedAndProject) — the ratio is the census-scan ratio in
      // both regimes (vocabgrow grows the census ×10 but the ranked frame
      // stays 4096). q218 Good–Turing: row-local trigram build + census
      // groupBy; the counts-of-counts frame is max-frequency-bounded —
      // the ratio is the trigram-scan ratio.
      "q217_vocab_coverage", "q218_good_turing",
      // q219 Jelinek-Mercer EM: the q132 join shape to build the pinned
      // (pu, pb) frame, then rounds×2 map-side-combined aggregates over
      // it — the ratio is the pair-frame build ratio (q132's)
      "q219_jelinek_mercer",
      // q220 keep-best purge: q70/q72's cluster chain + one grouped
      // struct-max over cluster members — the ratio should track q72's
      // (id-shift deepens shingle df at constant gram space; the rep
      // selection itself is map-side combined)
      "q220_dedup_keep_best",
      // q221 truncation card: one tokenize scan + a 3-row broadcast — the
      // scan ratio. q222 threshold sweep: ONE q33 pair pass bucketed by a
      // 4-row broadcast — should track q33's ratio (the pair kernel
      // dominates; per-threshold work is conditional counting)
      "q221_context_truncation", "q222_dedup_threshold_sweep",
      // q223 JS matrix: two map-side-combined censuses + a FIXED
      // 1025-dimension pair stage (|sources|²/2 × 1025 rows at any
      // corpus size) — the ratio is the census-scan ratio
      "q223_source_divergence",
      // q224 RBO stability: two q90-shape model fits over the pinned
      // trigram frame + two broadcast-scored passes; everything after the
      // two top-100 selections runs on 100-row frames — the ratio is the
      // trigram-scan ratio (q90's)
      "q224_ranker_agreement",
      // q225 greedy source selection: 5 rounds × (anti-join + grouped
      // count + |sources|-row argmax) over the pinned distinct
      // (source, trigram-type) frame — Heaps-bounded, the ratio is the
      // type-frame build ratio
      "q225_source_selection",
      // round-12 session-3 rows: q226 rides q70's CC machinery (its ratio
      // IS q70's plus a 3-row rollup); q227 is the bucketed WRITE + join —
      // the write is corpus-linear, the join exchange-free by layout;
      // q228 is two gram-keyed shuffles (census + join-back), linear in
      // corpus gram count — the q199 cost class
      "q226_cluster_safe_split", "q227_bucketed_join",
      "q228_first_seen_novelty",
      // q229 runs BOTH shipped dedup kernels (q33 capped + q34 banded) —
      // its ratio is their sum plus a pair-keyed left join
      "q229_lsh_dedup_recall",
      // q230 is the partitioned WRITE (corpus-linear) + a directory-pruned
      // rollup that reads 1/|langs| of what it wrote; q231 is one tokenize
      // scan + a 1-row moment frame; q232 rides q70's cluster chain
      "q230_partition_pruned_scan", "q231_signal_correlations",
      "q232_dup_cluster_histogram",
      // q233 is the q199 broadcast-decontam shape + a constant-factor
      // (×8) position expansion on the hit set; q234 is rounds × one
      // corpus pass against a 1-row broadcast over the embeddings replica
      "q233_decontam_span_surgery", "q234_kcenter_selection",
      // q235 shares ONE index build across the four sweep points; the
      // truth side is the fixed-panel brute kernel (the q207 posture)
      "q235_nprobe_sweep",
      // q236 rides the memoized q70 assignment + the q33 pair set — one
      // pair-keyed join + a cluster rollup on top of their cost
      "q236_dup_chain_audit",
      // q238 is q233's shape plus the row-local reassembly: the cut-position
      // frame rides the hit set (×8 per hit) and the clean-text rebuild is
      // an indexed-lambda filter on the pinned token arrays — the ratio
      // should track q233's (output text grows with the duplicate flood,
      // the only extra term)
      "q238_decontam_surgery_emit",
      // q239 rides the same frames as q238 plus a second broadcast-join
      // census over the contaminated slice — same cost class
      "q239_decontam_residual_audit",
      // q237 shares one index build + ONE ADC pass at the max shortlist;
      // re-rank reads shortlist·|panel| full vectors through an equi join
      "q237_shortlist_sweep")
      .filter(q => only.forall(_.contains(q)))
    // text-dedup/curation queries get a second ×factor measurement on the
    // growing-vocabulary replica — the regime real corpora live in
    val vocabGrowQueries = Set("q33_ngram_jaccard_pairs", "q34_minhash_lsh_pairs",
      "q35_simhash_pairs", "q70_dup_clusters", "q72_dedup_purge",
      "q73_decontamination", "q76_dup_spans", "q79_bpe_train", "q80_bpe_encode",
      "q87_range_join_windows", "q88_incremental_dedup", "q89_heavy_hitters",
      "q90_charlm_ppl", "q91_line_dedup", "q92_bloom_decontam", "q97_lr_filter",
      "q100_curation_e2e", "q102_doc_repetition_purge", "q103_lsa_component",
      "q104_triangle_counts", "q105_lsa_second", "q109_lsa_topk", "q106_funnel",
      "q112_minhash_cluster_purge", "q114_kcore", "q115_adamic_adar",
      "q107_retention", "q108_rollup", "q113_anomaly", "q118_pmi",
      "q119_lsa_doc_scores",
      // round-8 second-regime completions (VERDICT r7 gap #1): the
      // documents-based sampling/BPE rows ride the vocabgrow replica; the
      // embeddings-based rows ride the translated-copies replica above
      "q110_kmeans_clusters", "q111_sample_quota", "q116_pca_component",
      "q117_pca_scores", "q120_bpe_roundtrip", "q122_weighted_sample",
      "q123_pca_topk", "q127_bfs_hops", "q128_countmin", "q129_hll_portable",
      "q130_random_projection", "q132_stupid_backoff", "q133_zorder_layout",
      // round-8 continuations: all six new rows are two-regime
      "q134_hits", "q135_dsir_weights", "q136_dsir_resample",
      "q137_kmv_setops", "q138_textrank", "q139_scd2_intervals",
      "q140_ewma", "q141_unigram_train", "q142_unigram_encode",
      "q143_basket_rules", "q144_incremental_agg", "q145_unigram_em",
      "q146_centroid_classify", "q147_shortest_paths", "q149_modularity",
      "q150_trend_slopes", "q151_chi_square", "q152_prefix_jaccard",
      "q154_psi_drift", "q155_lr_calibration", "q156_clustering_coeff",
      "q157_rake_keyphrases", "q158_burstiness", "q159_zipf_fit",
      "q160_langid_confusion", "q161_type_entropy", "q162_unigram_ids",
      "q163_data_card", "q167_conversion_latency", "q168_reciprocity",
      "q169_assortativity", "q170_spell_suggest", "q171_ktruss",
      "q172_markov_transitions", "q173_item_cf", "q174_rfm_segments",
      // round-9 second-regime completions (VERDICT r8 gap #4): the
      // embeddings-based rows ride the translated-copies replica (more
      // structure at constant local population — note their catalog query
      // sets still grow with the corpus, the q37/q125 caveat); q148 rides
      // the new orders time-shift replica (longer history, constant
      // comparison windows)
      "q124_pq_codes", "q148_snapshot_diff", "q153_mmr_rerank",
      "q164_ivfpq_topk", "q165_centroid_dists", "q166_ivfpq_rerank",
      // round-9 additions (q177 is id-shift-only: it never reads text;
      // q179 rides the translated-copies embeddings replica)
      "q175_pretrain_pipeline", "q176_hashed_lr_filter",
      "q178_ols_normal_eq", "q179_hard_negatives", "q180_wordpiece_train",
      "q182_curriculum_order", "q183_shared_passages", "q184_quality_rules",
      "q185_source_leakage", "q186_cdc_chunks", "q187_containment_pairs",
      "q188_tokenizer_eval", "q191_soft_dedup_weights",
      "q192_accuracy_ci", "q193_worst_group", "q194_source_quality_card",
      // round-10 documents-based rows ride the vocabgrow replica; q197 and
      // q200 are embeddings-based (id-shift/translated only, the q177 rule)
      "q198_data_budget", "q199_exact_ngram_decontam",
      "q201_attrition_funnel", "q202_packing_efficiency",
      "q203_signal_auc", "q204_gate_agreement", "q205_ks_drift",
      "q206_split_manifest",
      // round-12 documents-based rows: both two-regime
      "q210_duplicated_spans", "q211_winnowing_overlap",
      // round-12 session-2 documents-based rows: all two-regime
      "q212_kneser_ney", "q213_blocklist_scan", "q214_self_bleu",
      "q215_ccnet_buckets", "q216_char_entropy",
      "q217_vocab_coverage", "q218_good_turing", "q219_jelinek_mercer",
      "q220_dedup_keep_best", "q221_context_truncation",
      "q222_dedup_threshold_sweep", "q223_source_divergence",
      "q224_ranker_agreement", "q225_source_selection",
      // round-12 session-3 documents-based rows (q227 never reads text —
      // id-shift only, the q177 rule)
      "q226_cluster_safe_split", "q228_first_seen_novelty",
      "q229_lsh_dedup_recall", "q230_partition_pruned_scan",
      "q231_signal_correlations", "q232_dup_cluster_histogram",
      // q233 is documents-based two-regime; q234 reads only embeddings
      // (id-shift/translated replica, the q177 rule)
      "q233_decontam_span_surgery", "q236_dup_chain_audit",
      // round-13: q238 is q233 + the reassembly leg, q239 the audit on
      // top — both documents-based
      "q238_decontam_surgery_emit", "q239_decontam_residual_audit")
    // Measurement harness shared by EVERY probe row (time() and the q95
    // k-scaled timeK below — one copy, so the hygiene can't diverge between
    // rows): time the action, then reset all cache state. Same hygiene as
    // Bench — no pinned-cache carry-over between measurements — plus
    // localCheckpoint blocks, which clearCache() does NOT drop (they are
    // plain persisted RDDs, not cached plans). Leaving q25's ×10 checkpoint
    // blocks resident inflated the NEXT query's base timing 6× in the first
    // probe run of round 5, overstating that query's ratio collapse.
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      Caching.release()
      // the unpersist-all below would clear memoized components' checkpoint
      // blocks and poison surviving memo entries — and a memo hit would
      // make a repeated base measurement near-free, corrupting the ratio
      ml.Lsa.clearMemo()
      ml.Pca.clearMemo()
      operators.DupClusters.clearMemo()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      sec
    }
    def time(name: String, dir: String): Double =
      timed(SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save())
    val rows = probeQueries.map { name =>
      time(name, baseDir) // warm-up
      // Min-of-2 per (query, dir), with the two passes of each dir
      // INTERLEAVED (base, x10[, vg], base, x10[, vg]) rather than
      // consecutive (the Bench round-robin discipline at probe scale): a
      // sustained VM-load window now inflates one pass of EVERY regime
      // instead of both passes of ONE — which min-of-2 then discards — so a
      // stall can no longer manufacture a super-linear ratio by landing
      // both ×10 passes (the 106 s q116 observation from round 8).
      val probeVg = vocabGrowQueries(name)
      val b1 = time(name, baseDir); val x1 = time(name, outDir)
      val v1 = if (probeVg) Some(time(name, vgDir)) else None
      val b2 = time(name, baseDir); val x2 = time(name, outDir)
      val v2 = if (probeVg) Some(time(name, vgDir)) else None
      val base = math.min(b1, b2)
      val big = math.min(x1, x2)
      val ratio = big / base
      val vg = v1.flatMap(a => v2.map(b => math.min(a, b)))
      val vgJson = vg.map(v => f""","x${factor}_vocabgrow_sec":$v%.2f,"vocabgrow_ratio":${v / base}%.1f""").getOrElse("")
      println(f"""{"query":"$name","base_sec":$base%.2f,"x${factor}_sec":$big%.2f,"ratio":$ratio%.1f$vgJson}""")
      (name, base, big, ratio, vg)
    }
    // q95's scale path is k ∝ n (SemDeDup's own deployment regime: MORE
    // clusters, not deeper ones): with cluster populations held at their
    // base size, Σ cluster² — the intra-cluster pair-search cost — grows
    // linearly in n. Measured here as a separate row because the catalog
    // entry must keep k=8 (the unrolled-CTE oracle's tractability bound),
    // so the generic probe above can only exercise the fixed-k quadratic
    // regime that the operator's scaladoc already declares.
    if (only.forall(_.contains("q95_semantic_dedup"))) {
      def timeK(dir: String, k: Int): Double =
        timed(graft.operators.Similarity.semanticDedup(
          graft.sources.Tables(spark, dir, "embeddings"),
          k = k, iterations = 3, threshold = 0.3, maxBlock = 10000)
          .write.format("noop").mode("overwrite").save())
      timeK(baseDir, 8) // warm-up
      val kBase = math.min(timeK(baseDir, 8), timeK(baseDir, 8))
      val kBig = timeK(outDir, 8 * factor)
      println(f"""{"query":"q95_semantic_dedup_kscaled","base_sec":$kBase%.2f,"x${factor}_sec":$kBig%.2f,"ratio":${kBig / kBase}%.1f}""")
    }
    // q121's catalog input is the 30-vertex nation fixture (constant in sf),
    // so the catalog row cannot scale-probe. The OPERATOR is probed instead
    // on the real co-occurrence graph (the q104/q114 input) in both regimes:
    // id-shift multiplies edge multiplicity pre-distinct at constant
    // distinct-graph size; vocabgrow multiplies the graph itself (10
    // disjoint replicas). Edges are out-degree-normalized (the q24/q25
    // shape) — mass must stay ≤ 1 or the scaled-long 1e18 accumulator
    // overflows; seeds are the 5 lowest vertex ids so the probe works on
    // any replica's vocabulary.
    if (only.forall(_.contains("q121_personalized_pagerank"))) {
      def timePpr(dir: String): Double = timed {
        val edges = graft.graph.Graphs.normalizeEdges(
          graft.graph.Graphs.coOccurrence(
            graft.operators.TextPipeline.tokenize(
              graft.sources.Tables(spark, dir, "documents")))
            .filter(col("cnt") >= 20))
          .select(col("src"), col("dst"), col("w"))
        val seeds = edges.select(col("src").as("v")).distinct()
          .orderBy(col("v")).limit(5)
        graft.graph.Graphs.personalizedPageRank(edges, seeds, iterations = 10)
          .write.format("noop").mode("overwrite").save()
      }
      timePpr(baseDir) // warm-up
      val base = math.min(timePpr(baseDir), timePpr(baseDir))
      val big = math.min(timePpr(outDir), timePpr(outDir))
      val vg = math.min(timePpr(vgDir), timePpr(vgDir))
      println(f"""{"query":"q121_personalized_pagerank_opscaled","base_sec":$base%.2f,"x${factor}_sec":$big%.2f,"ratio":${big / base}%.1f,"x${factor}_vocabgrow_sec":$vg%.2f,"vocabgrow_ratio":${vg / base}%.1f}""")
    }
    // ANN recall contract at scale (VERDICT r7 stretch #9): re-measure
    // q38/q50's recall@10 vs exact brute force on the ×factor id-shift
    // replica — same space, ×factor density, the regime where bucket
    // occupancy actually changes — so the bucketing's recall/cost trade is
    // evidenced at scale, not just its speed. Enabled via
    // SPARK_GRAFT_PROBE_ONLY=ann_recall (brute force at ×10 is the cost).
    if (only.exists(_.contains("ann_recall"))) {
      def recallAt(dir: String): (Double, Double, Long) = {
        val emb = graft.sources.Tables(spark, dir, "embeddings")
        val exact = Caching.pin(
          graft.operators.Similarity.bruteTopKAgg(emb, emb, 10)
            .select(col("q_id"), col("n_id")))
        val n = exact.count()
        def rec(approx: DataFrame): Double =
          approx.select(col("q_id"), col("n_id"))
            .join(exact, Seq("q_id", "n_id"), "left_semi").count().toDouble / n
        val lsh = rec(graft.operators.Similarity.lshTopK(emb, 10))
        val ivf = rec(graft.operators.Similarity.ivfTopK(emb, 10))
        Caching.release()
        spark.catalog.clearCache()
        (lsh, ivf, n)
      }
      val (lshB, ivfB, nB) = recallAt(baseDir)
      val (lshX, ivfX, nX) = recallAt(outDir)
      println(f"""{"probe":"ann_recall","k":10,"base_n":$nB,"x${factor}_n":$nX,"lsh_recall_base":$lshB%.3f,"lsh_recall_x$factor":$lshX%.3f,"ivf_recall_base":$ivfB%.3f,"ivf_recall_x$factor":$ivfX%.3f}""")
    }
    // AQE skew-join vs the manual salt (VERDICT r9 #5): measured evidence
    // for WHEN Skew.saltedJoin is still required once AQE is on. A 90%-hot
    // key is synthesized over the ×factor events replica (deterministic
    // id-coin remap, no rand()), the tiny dim side's broadcast is disabled
    // so the join is a real SortMergeJoin (the 100 TB regime where the
    // probe side is too big to broadcast and the dim is a shuffled join),
    // and the same plan runs (a) AQE skew-join OFF, (b) ON with thresholds
    // scaled to the local data, (c) manually salted. The aggregation twin —
    // a per-key DISTINCT count, whose (key, value) expansion partial
    // aggregation can NOT collapse map-side — runs plain vs salted, the
    // case AQE never touches (skew handling is join-only).
    // Enabled via SPARK_GRAFT_PROBE_ONLY=skew_aqe.
    if (only.exists(_.contains("skew_aqe"))) {
      // ×32 deterministic row amplification (explode, not more files): the
      // ×10 replica's 1M rows put only ~900k on the hot key — well inside
      // one task's comfort zone, so neither AQE nor the salt had anything
      // to fix (first run of this probe measured all three variants within
      // 0.2 s). At 32M rows / ~29M on the hot key, the unsalted plain join
      // genuinely bottlenecks on the one hot reduce task — the regime the
      // probe exists to measure.
      val ev = graft.sources.Tables(spark, outDir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .withColumn("rep", explode(sequence(lit(0L), lit(31L))))
        .select((col("event_id") * 32L + col("rep")).as("event_id"),
          col("event_type"), col("value"))
        .withColumn("event_type",
          when(pmod(xxhash64(col("event_id")), lit(10L)) < 9L, lit("view"))
            .otherwise(col("event_type")))
      val dim = ev.groupBy(col("event_type"))
        .agg(avg(col("value")).as("type_avg"))
      // two downstream shapes, because they exercise DIFFERENT AQE paths:
      //   - sameKeyAgg = true: the join feeds a groupBy on the JOIN KEY.
      //     OptimizeSkewedJoin declines to split here — splitting breaks
      //     the hash partitioning the downstream agg wants to reuse, and
      //     AQE won't trade a split for an extra exchange unless
      //     forceOptimizeSkewedJoin overrides it. This is the shape where
      //     the manual salt stays mandatory.
      //   - sameKeyAgg = false: the join output is consumed with no
      //     partitioning requirement (a per-row derivation + global sum) —
      //     the textbook case AQE's skew split handles on its own.
      // the dim side MATERIALIZED (checkpoint cuts the in-plan aggregate out
      // of the join's physical children): OptimizeSkewedJoin pattern-matches
      // ONLY SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — with the dim
      // aggregate sitting between its shuffle and the join, the whole join
      // is disqualified from skew handling, which is the first finding this
      // probe surfaces (see the printed results). Rebuilt per timed call:
      // timed()'s inter-run cleanup unpersists every RDD, and a truncated
      // checkpoint cannot recompute.
      def dimMat() = dim.coalesce(1).localCheckpoint(eager = true)
      def joinBody(salted: Boolean, sameKeyAgg: Boolean,
                   matDim: Option[DataFrame] = None): Unit = {
        val d = matDim.getOrElse(dim)
        val joined =
          if (salted) graft.operators.Skew.saltedJoin(ev, d, "event_type", salts = 8)
          else ev.join(d, "event_type")
        val out =
          if (sameKeyAgg) joined.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(when(col("value") > col("type_avg"), 1L).otherwise(0L)).as("n_above"))
          else joined
            .select(when(col("value") > col("type_avg"), 1L).otherwise(0L).as("above"))
            .agg(sum(col("above")).as("n_above"))
        if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN")) {
          // execute THIS QueryExecution (write.save spawns its own), so the
          // printed adaptive plan is the final one with skew decisions made
          val qe = out.queryExecution
          qe.toRdd.foreachPartition(_ => ())
          println(s"=== PLAN salted=$salted sameKeyAgg=$sameKeyAgg matDim=${matDim.isDefined} " +
            s"skewJoin=${spark.conf.get("spark.sql.adaptive.skewJoin.enabled")} " +
            s"forced=${spark.conf.getOption("spark.sql.adaptive.forceOptimizeSkewedJoin")}")
          println(qe.executedPlan.toString.take(3000))
        } else out.write.format("noop").mode("overwrite").save()
      }
      def withConf(pairs: (String, String)*)(body: => Double): Double = {
        val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
        pairs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body
        finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
      def timeJoin(skewOn: Boolean, salted: Boolean, sameKeyAgg: Boolean,
                   forced: Boolean = false, matDim: Boolean = false): Double = withConf(
        noBroadcast,
        "spark.sql.adaptive.skewJoin.enabled" -> skewOn.toString,
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> forced.toString,
        // local-scale thresholds: the defaults (256 MB) never fire on a
        // test-sized partition; the RATIO contract (factor 2, median-based
        // split) is what the probe exercises
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
        // checkpoint setup OUTSIDE the timed body — the probe times the join
        val d = if (matDim) Some(dimMat()) else None
        timed(joinBody(salted, sameKeyAgg, d))
      }
      // the salted distinct-count salts BY VALUE (one value → one salt
      // cell, cells disjoint), so the per-cell distincts sum exactly AND
      // the hot key's rows spread over 8 reducers — value-equal to the
      // plain form, unlike an id-derived salt which double-counts
      def timeAgg(salted: Boolean): Double = timed {
        val agg =
          if (salted) ev
            .withColumn("_salt", pmod(xxhash64(col("value")), lit(8L)))
            .groupBy(col("event_type"), col("_salt"))
            .agg(countDistinct(col("value")).as("d"))
            .groupBy(col("event_type")).agg(sum(col("d")).as("n_distinct"))
          else ev.groupBy(col("event_type"))
            .agg(countDistinct(col("value")).as("n_distinct"))
        agg.write.format("noop").mode("overwrite").save()
      }
      timeJoin(skewOn = false, salted = false, sameKeyAgg = true) // warm-up
      def best2(body: => Double): Double = math.min(body, body)
      // shape A: skewed join feeding a same-join-key aggregation
      val jPlain = best2(timeJoin(false, false, sameKeyAgg = true))
      val jAqe = best2(timeJoin(true, false, sameKeyAgg = true))
      val jForced = best2(timeJoin(true, false, sameKeyAgg = true, forced = true))
      val jSalt = best2(timeJoin(false, true, sameKeyAgg = true))
      // shape B: skewed join with no downstream partitioning requirement
      val bPlain = best2(timeJoin(false, false, sameKeyAgg = false))
      val bAqe = best2(timeJoin(true, false, sameKeyAgg = false))
      val bSalt = best2(timeJoin(false, true, sameKeyAgg = false))
      // shape C: dim side pre-materialized — both SMJ children are bare
      // shuffle reads, the ONLY shape OptimizeSkewedJoin pattern-matches
      val cPlain = best2(timeJoin(false, false, sameKeyAgg = false, matDim = true))
      val cAqe = best2(timeJoin(true, false, sameKeyAgg = false, matDim = true))
      val cSalt = best2(timeJoin(false, true, sameKeyAgg = false, matDim = true))
      timeAgg(salted = false) // warm-up
      val aPlain = best2(timeAgg(false))
      val aSalt = best2(timeAgg(true))
      println(f"""{"probe":"skew_aqe","samekey_plain_sec":$jPlain%.2f,"samekey_aqe_sec":$jAqe%.2f,"samekey_aqe_forced_sec":$jForced%.2f,"samekey_salted_sec":$jSalt%.2f,"bare_plain_sec":$bPlain%.2f,"bare_aqe_sec":$bAqe%.2f,"bare_salted_sec":$bSalt%.2f,"matdim_plain_sec":$cPlain%.2f,"matdim_aqe_sec":$cAqe%.2f,"matdim_salted_sec":$cSalt%.2f,"agg_plain_sec":$aPlain%.2f,"agg_salted_sec":$aSalt%.2f}""")
    }
    // PQ search cost vs CORPUS size, the question the catalog rows can't
    // ask (their query set grows with the corpus): a FIXED 25-query set
    // from the base corpus searches the ×factor codes. ADC should scale
    // with the code scan (n·m lookup adds); re-rank adds a
    // shortlist-bounded equi join on top. Codebooks/codes are trained per
    // dir inside the timed body — training is the already-probed q124
    // shape, and the 25-query table build is corpus-independent.
    if (only.forall(_.contains("q125_pq_adc_topk"))) {
      def timePq(dir: String, rerank: Boolean): Double = timed {
        val e = graft.sources.Tables(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
        val qs = graft.sources.Tables(spark, baseDir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
          .filter(col("vec_id") % 20 === 0)
        val cbs = graft.ml.Pq.fit(e, m = 8, k = 16, iterations = 2)
        val codes = graft.ml.Pq.encode(e, cbs, m = 8)
        val res = if (rerank)
          graft.ml.Pq.adcRerankTopK(qs, codes, cbs, e, m = 8, kc = 16, shortlist = 50, k = 10)
        else graft.ml.Pq.adcTopK(qs, codes, cbs, m = 8, kc = 16, k = 10)
        res.write.format("noop").mode("overwrite").save()
      }
      for (rerank <- Seq(false, true)) {
        val tag = if (rerank) "q126_pq_rerank_opscaled" else "q125_pq_adc_opscaled"
        timePq(baseDir, rerank) // warm-up
        val base = math.min(timePq(baseDir, rerank), timePq(baseDir, rerank))
        val big = math.min(timePq(outDir, rerank), timePq(outDir, rerank))
        println(f"""{"query":"$tag","base_sec":$base%.2f,"x${factor}_sec":$big%.2f,"ratio":${big / base}%.1f}""")
      }
    }
    println(rows.map { case (n, b, _, r, vg) =>
      f"$n=$r%.1fx" + vg.map(v => f"/vg=${v / b}%.1fx").getOrElse("")
    }.mkString("SUMMARY ", " ", s" (linear=$factor.0x)"))
    spark.stop()
  }
}

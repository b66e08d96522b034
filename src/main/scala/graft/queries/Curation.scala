package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text
import OracleDialect._

/** Corpus-curation operators (training-data pipeline tier): benchmark
  * decontamination and quality-budgeted selection — the two steps that
  * sit between dedup (d-queries) and packing (t11/p02) in a real
  * LLM data pipeline.
  *
  * Scale shapes:
  *  - c01 joins the exploded train shingles against the (distinct)
  *    eval vocabulary — shuffle on the shingle fingerprint with
  *    map-side partial agg on the hit counts; the eval vocabulary is
  *    the SMALL side (benchmarks are tiny next to a 100 TB corpus) so
  *    AQE broadcasts it and the train side never reshuffles.
  *  - p03's per-source quality ranking is a window; a hot source at
  *    100 TB takes the same two-level salted treatment as t11 (the
  *    budget cut only needs the running sum, which salts exactly like
  *    the packing prefix sum).
  */
object Curation {

  /** Deterministic pseudo-benchmark membership: every 50th doc_id.
    * A real pipeline would read the benchmark corpus as its own table;
    * the fixtures ship only `documents`, so the eval set is carved out
    * deterministically (both engines compute the same predicate).
    */
  private val isEval = col("doc_id") % 50 === 0

  /** Per-train-doc contamination: (doc_id, source, n_tokens, frac) —
    * frac = fraction of the doc's distinct shingles appearing anywhere
    * in the eval vocabulary. The shared core of c01 (report) and c03
    * (removal); Catalyst prunes `n_tokens` out of c01's plan, so the
    * report pays nothing for the extra column.
    */
  private def contamination(s: SparkSession, dir: String): DataFrame =
    // rides the suite-shared silver projection (Dedup.shingleDocs):
    // under a suite runner the tokenization is paid once across the
    // dedup+contamination families; standalone it is the same plan the
    // inline projection produced
    contaminationDocs(Dedup.shingleDocs(s, dir), prefilter = true)

  /** c01/c03's core over a raw documents relation. `prefilter = true`
    * (the shipped form, r11) probes a broadcast bloom of the eval
    * shingle FINGERPRINTS map-side and pays the explode + vocabulary
    * semi-join only for docs the bloom flags. EXACT by the bloom's
    * one-sided error: a shingle that string-matches the eval
    * vocabulary has the same fingerprint, and the bloom never returns
    * false for an inserted value — so an unflagged doc provably has
    * zero exact hits (its left-join row coalesces to the same 0.0 the
    * naive form computes); a false POSITIVE only sends a clean doc
    * through the exact join, which scores it 0 as before. Decontam
    * corpora are mostly clean — at the salted 100× replica the
    * flagged sliver is a few percent, so the corpus-sized
    * explode-and-shuffle (the whole cost of the naive shape) collapses
    * to the sliver while results stay hash-identical
    * (ContaminationPrefilterSpec pins naive == prefiltered; the x03
    * driver-built-sketch precedent covers the probe UDF).
    */
  private[queries] def contaminationOver(raw: DataFrame,
      prefilter: Boolean): DataFrame =
    contaminationDocs(raw
      .select(col("doc_id"), col("source"),
        Text.tokenStats(col("text")).getField("_1").as("n_tokens"),
        Text.distinctShingles(col("text")).as("sh")), prefilter)

  private def contaminationDocs(docs: DataFrame,
      prefilter: Boolean): DataFrame = {
    val evalVocab = docs.filter(isEval)
      .select(explode(col("sh")).as("s")).distinct()
    val train = docs.filter(!isEval)
    val candidates = if (!prefilter) train else {
      val evalFps = evalVocab.select(Text.charFp(col("s")).as("f")).distinct()
      val nEval = evalFps.count()
      // empty eval vocabulary ⇒ nothing can overlap (stat.bloomFilter
      // also NPEs on an empty relation) — skip every doc outright
      if (nEval == 0) train.limit(0)
      else {
        val bf = evalFps.stat.bloomFilter("f", nEval, BloomFpp)
        // r12: codegen probe (functions/SketchProbes.scala), not a
        // Scala UDF — no per-row Seq[Long] boxing on the corpus-sized
        // side, and a null `sh` now yields null > 0 = false (skip the
        // candidate; the final left join still emits the doc with
        // frac 0.0, matching the naive path) instead of an NPE
        train.filter(graft.functions.SketchProbes
          .bloomHits(Text.fps(col("sh")), bf) > 0)
      }
    }
    val hits = candidates
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .join(evalVocab, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    train
      .select(col("doc_id"), col("source"), size(col("sh")).as("n"), col("n_tokens"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        when(col("n") > 0,
          coalesce(col("n_hit"), lit(0L)).cast("double") / col("n"))
          .otherwise(lit(0.0)).as("frac"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark contamination: for each train doc, the fraction of its
    // distinct 3-gram shingles that appear ANYWHERE in the eval set.
    // Per-source report: docs, contaminated count (frac ≥ 0.5), and
    // the summed contamination mass (floor-micros — order-independent).
    "c01_contamination" -> ((s, dir) =>
      contamination(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("frac") >= 0.5, 1L).otherwise(0L)).as("n_contaminated"),
          sum(floor(col("frac") * lit(1000000.0)).cast("long")).as("sum_frac_micros"))
        .orderBy("source")),

    // The REMOVE step c01 only reports on: drop contaminated docs
    // (frac ≥ 0.5) and account per-source retention — kept docs, kept
    // tokens, and the retained fraction in floor-micros. Same scale
    // shape as c01 (the decontamination verdict is the same semi-join
    // + partial agg); the cut itself is a map-side predicate.
    "c03_decontaminate" -> ((s, dir) =>
      contamination(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_train_docs"),
          sum(when(col("frac") < 0.5, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("frac") < 0.5, col("n_tokens").cast("long")).otherwise(0L))
            .as("tokens_kept"))
        .select(col("source"), col("n_train_docs"), col("n_kept"), col("tokens_kept"),
          floor(col("n_kept").cast("double") / col("n_train_docs") * lit(1000000.0))
            .cast("long").as("retention_micros"))
        .orderBy("source")),

    // Quality-budgeted selection: per source, rank docs by quality
    // score (desc, doc_id tiebreak) and keep the prefix whose running
    // token count stays within the budget — the curation cut that
    // turns "all data" into "the best N tokens per source".
    //
    // Skew-safe two-phase formulation (the t11/saltedCum treatment,
    // adapted to a COMPUTED order key): the naive shape is one window
    // sorting a whole source in a single task. Here the order key is
    // the quality score, so contiguous-id salting doesn't align with
    // the order; instead phase 1 range-buckets each source by an
    // approx-percentile histogram of q (boundaries only affect load
    // balance, NEVER the result: bucket = #{boundary > q} is a
    // monotone function of q, so bucket order == q order and ties
    // stay together), and phase 2 runs the heavy running sum within
    // (source, bucket) — parallel across buckets — plus a tiny
    // per-source window over the per-bucket totals (rows = #buckets)
    // for each bucket's base offset. base + local running sum is
    // EXACTLY the whole-source prefix sum; the oracle is unchanged.
    "p03_token_budget" -> ((s, dir) =>
      tokenBudgetCut(Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          Text.tokenStats(col("text")).getField("_1").as("n_tokens"),
          Text.qualityScore(col("text")).as("q")), budget = 5000L)),

    // Weighted mixture sampling — the data-mixing step that turns "one
    // corpus" into "the language mix the training run wants": per-lang
    // keep rates (per-mille), membership decided by the CONTENT hash
    // (duplicate texts sample identically across runs, cluster sizes,
    // and engines — no RNG state anywhere). The weights relation is a
    // broadcast dim; the per-stratum accounting aggregates map-side.
    "p04_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      val weights = Seq(("en", 800L), ("de", 400L), ("fr", 400L), ("es", 400L))
        .toDF("lang", "keep_per_mille")
      Tables(s, dir, "documents")
        .select(col("source"), col("lang"),
          Text.tokenStats(col("text")).getField("_1").as("n_tokens"),
          pmod(Text.charFp(col("text")), lit(1000L)).as("h"))
        .join(broadcast(weights), Seq("lang"), "left")
        .withColumn("keep", col("h") < coalesce(col("keep_per_mille"), lit(250L)))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("keep"), col("n_tokens")).otherwise(lit(0L))).as("tokens_sampled"))
        .orderBy("source", "lang")
    }),

    // Epoch upsampling — p04's other half: instead of DOWN-sampling
    // over-represented strata, UP-sample scarce high-value ones by a
    // per-lang repeat factor (the "wiki x3" mixing pattern). Replication
    // is explode(sequence(1, n_rep)) — a narrow row multiplier, no
    // shuffle until the accounting agg — and every emitted copy carries
    // its epoch index, so downstream packing stays deterministic.
    "p05_upsample_mix" -> ((s, dir) => {
      import s.implicits._
      val repeats = Seq(("en", 1), ("de", 3), ("fr", 3), ("es", 3))
        .toDF("lang", "n_rep")
      Tables(s, dir, "documents")
        .select(col("source"), col("lang"),
          Text.tokenStats(col("text")).getField("_1").as("n_tokens"))
        .join(broadcast(repeats), Seq("lang"), "left")
        .withColumn("n_rep", coalesce(col("n_rep"), lit(2)))
        .withColumn("epoch", explode(sequence(lit(1), col("n_rep"))))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_emitted"),
          sum(col("n_tokens")).as("tokens_emitted"),
          max(col("epoch")).cast("int").as("max_epoch"))
        .orderBy("source", "lang")
    }),

    // Decontamination membership via a BROADCAST BLOOM FILTER — the
    // zero-shuffle form of c01's semi-join. At 100 TB the eval
    // vocabulary's exact semi-join still shuffles the exploded corpus
    // shingles; a bloom built once over the (tiny) eval side and probed
    // MAP-SIDE flags candidate docs without the corpus ever leaving its
    // scan — the standard two-phase shape (bloom prefilter → exact
    // re-check of the flagged sliver). Sketch-gated like x01/x02: the
    // declared output carries only oracle-computable exact columns plus
    // two flags from the bloom's own contract — no_false_neg (a bloom
    // NEVER misses a member: min over docs of bloom−exact hits ≥ 0)
    // and fp_within_bound (measured false-positive rate on the
    // non-member probes ≤ FpBound, global so the binomial noise at
    // small per-source probe counts can't flake the gate). The oracle
    // emits the same exact columns and literal 1s — a bloom regression
    // flips a flag and breaks the hash.
    "x03_bloom_decontam" -> ((s, dir) =>
      bloomDecontamDocs(
        Dedup.shingleDocs(s, dir)
          .select(col("doc_id"), col("source"), col("sh"), isEval.as("is_eval")),
        BloomFpp, BloomFpBound).orderBy("source")),

    // Model-based quality filtering — the fasttext-style classifier
    // step (CCNet / LLaMA-1 data prep) that sits next to t03's
    // HEURISTIC quality score in a real pipeline: hash each token into
    // a fixed feature bucket, score = integer dot with the bucket
    // weight vector, keep score > 0. The weight vector here is a
    // deterministic closed form standing in for trained parameters
    // (see Text.classifierScoreStr); at 100 TB the real weights are a
    // few-hundred-KB broadcast and the score stays a map-side codegen
    // expression fused into the scan — the per-source accounting is
    // the only shuffle.
    "c04_classifier_filter" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), Text.classifierScore(col("text")).as("score"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_kept"),
          sum(col("score")).as("sum_score"))
        .orderBy("source")),

    // Gopher-style RULE filtering (Rae et al. 2021, arXiv 2112.11446
    // §A1.1 — public) — the heuristic rule battery that runs BEFORE
    // model scoring (c04) in a standard curation pipeline: word-count
    // window, mean-word-length window, minimum stopword evidence,
    // minimum type-token ratio. Every rule is an INTEGER comparison
    // (3·n ≤ len ≤ 10·n instead of 3 ≤ len/n ≤ 10, 5·distinct ≥ n
    // instead of ttr ≥ 0.2), so the per-doc verdict is hash-exact by
    // construction with zero float arithmetic in either engine. The
    // output is the per-doc rule bitmask a real pipeline persists
    // (fail_bits: 1=wordcount, 2=meanlen, 4=stopwords, 8=ttr) plus the
    // all-rules pass flag. Scale: everything is computed scan-side
    // from the tokenStats/stopHits codegen kernels — ZERO shuffles
    // below the output order; the filter composes with c04/p03 as a
    // map-side predicate.
    "c05_gopher_rules" -> ((s, dir) => {
      // output-order sort below the kernels (the t08 pattern): the rules
      // fuse into the post-shuffle stage instead of the scan, the range
      // sampling never recomputes tokenStats/stopHits, and parallelism
      // follows shuffle.partitions rather than the file-split count
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .orderBy("doc_id")
        .select(col("doc_id"), col("source"),
          Text.tokenStats(col("text")).as("st"),
          Text.langHits(col("text")).getField("h_en").as("n_stop"))
        .select(col("doc_id"), col("source"),
          col("st").getField("_1").cast("long").as("n_tok"),
          col("st").getField("_2").cast("long").as("n_dst"),
          col("st").getField("_3").as("len"), col("n_stop"))
      val rWc = col("n_tok") >= 30 && col("n_tok") <= 100000
      val rMean = lit(3) * col("n_tok") <= col("len") &&
        col("len") <= lit(10) * col("n_tok")
      val rStop = col("n_stop") >= 2
      val rTtr = lit(5) * col("n_dst") >= col("n_tok")
      def fbit(c: Column, b: Int): Column = when(c, lit(0L)).otherwise(lit(1L << b))
      base.select(col("doc_id"), col("source"), col("n_tok").as("n_tokens"),
        (fbit(rWc, 0) + fbit(rMean, 1) + fbit(rStop, 2) + fbit(rTtr, 3)).as("fail_bits"),
        when(rWc && rMean && rStop && rTtr, lit(1L)).otherwise(lit(0L)).as("pass"))
    }),

    // ADAPTIVE quality thresholding — c04/c05 filter against FIXED
    // cutoffs; real curation recalibrates per stratum (a threshold
    // tuned on web text guts an academic source), so the cutoff here
    // is each source's own quality p25: pass 1 reduces to a
    // sources-sized threshold relation, pass 2 broadcasts it back and
    // filters map-side — the standard two-pass quantile filter. The
    // p25 is computed from its two RANK NEIGHBORS with an explicit
    // lerp whose IEEE op sequence the oracle mirrors literally
    // (ADVICE r10: Spark's builtin Percentile lerps as
    // (hi_idx−pos)·lo + (pos−lo_idx)·hi while DuckDB's quantile_cont
    // does lo + frac·(hi−lo) — last-ULP divergence that thr_micros'
    // floor(·1e6) could expose; deriving thr identically on both
    // sides makes the gate exact BY CONSTRUCTION, not by luck). The
    // rank window sorts each source's q's — the same per-group
    // materialization Spark's exact Percentile buffer pays — and the
    // 100 TB path is c06b's mergeable percentile_approx form, which
    // never sorts or buffers a group.
    "c06_adaptive_quality" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          Text.tokenStats(col("text")).getField("_1").cast("long").as("n_tokens"),
          Text.qualityScore(col("text")).as("q"))
      // pos = 0.25·(n−1); lo = floor(pos); thr = q_lo + frac·(q_hi−q_lo)
      // — each step one IEEE double op, oracle-identical (n < 2^53 so
      // the int→double casts are exact)
      val cnt = base.groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("pos", lit(0.25) * (col("n") - lit(1)).cast("double"))
        .withColumn("lo", floor(col("pos")))
      val w = Window.partitionBy(col("source")).orderBy(col("q"))
      val thr = base.select(col("source"), col("q"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .join(broadcast(cnt), "source")
        .filter(col("rk") === col("lo") + 1 || col("rk") === col("lo") + 2)
        .groupBy("source")
        .agg(min(col("pos")).as("pos"), min(col("lo")).as("lo"),
          min(when(col("rk") === col("lo") + 1, col("q"))).as("q_lo"),
          min(when(col("rk") === col("lo") + 2, col("q"))).as("q_hi"))
        .select(col("source"),
          (col("q_lo") + (col("pos") - col("lo").cast("double")) *
            (coalesce(col("q_hi"), col("q_lo")) - col("q_lo"))).as("thr"))
      base.join(broadcast(thr), Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("q") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("q") >= col("thr"), col("n_tokens")).otherwise(0L)).as("tokens_kept"),
          floor(max(col("thr")) * lit(1000000.0)).cast("long").as("thr_micros"))
        .orderBy("source")
    }),

    // c06's PRODUCTION threshold pass, gated x02-style (VERDICT r10
    // ask #6): at 100 TB the exact per-source percentile (which
    // buffers/sorts every group) swaps for percentile_approx — a
    // MERGEABLE GK sketch: bounded memory per partition, partial+final
    // combine, no group materialization anywhere. Approx sketches
    // can't hash-match a foreign engine, so the gate is the sketch's
    // CONTRACT: accuracy=1000 bounds rank error by n/1000, and the
    // approx p25 must land between the exact quantiles at 0.25 ∓ 0.05
    // (50× the nominal error — wide enough for the 25-doc smallest
    // fixture source where ±0.01 spans less than one rank, and still
    // orders of magnitude tighter than any real sketch regression).
    // The flag is deterministic, so rows+schema+hash gate it; the
    // oracle asserts the bound holds for every source.
    // AdaptiveApproxSpec pins the downstream effect: the approx cut
    // keeps within the rank-window of the exact cut per source.
    "c06b_adaptive_quality_approx" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), Text.qualityScore(col("text")).as("q"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          percentile_approx(col("q"), lit(0.25), lit(1000)).as("ta"),
          percentile(col("q"), array(lit(0.20), lit(0.30))).as("qs"))
        .select(col("source"), col("n_docs"),
          when(col("ta") >= col("qs")(0) && col("ta") <= col("qs")(1),
            lit(1L)).otherwise(lit(0L)).as("within_bound"))
        .orderBy("source")),

    // Temperature-scaled mixture quotas — p04 applies HANDED weights;
    // the standard automatic rule (the τ=1/2 temperature of
    // multilingual-sampling fame) derives each stratum's share from
    // its size: quota_s = ceil(C·√n_s), which UP-weights scarce
    // sources relative to proportional sampling without any
    // cross-source float normalization (÷Σ√n would hang the verdict
    // on a 20-term float sum's association order; per-source
    // ceil(C·√n) is one sqrt + one multiply, bit-exact per engine).
    // Membership is the content-hash rank within the source (p04's
    // determinism story: same doc ⇒ same fate across runs/engines).
    // Scale: quotas are a combinable count agg broadcast back; the
    // rank is one window per source — quota ≪ n_s, so at extreme
    // source skew the production form pre-trims map-side with a
    // broadcast coarse hash bound (keep h < 2·quota/n·M, then exact-
    // rank the surviving sliver — the x03 two-phase shape).
    "p07_temperature_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          Text.tokenStats(col("text")).getField("_1").cast("long").as("n_tokens"),
          pmod(Text.charFp(col("text")), lit(1000000L)).as("h"))
      val quotas = Tables(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("quota",
          ceil(lit(3.0) * sqrt(col("n_docs").cast("double"))).cast("long"))
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      base.join(broadcast(quotas), Seq("source"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .groupBy(col("source"), col("n_docs"), col("quota"))
        .agg(sum(when(col("rk") <= col("quota"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rk") <= col("quota"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
        .select("source", "n_docs", "quota", "n_kept", "tokens_kept")
        .orderBy("source")
    })
  )

  /** c06's production form as a callable API: the same two-pass
    * adaptive-threshold cut with pass 1 swapped from the exact
    * per-source percentile to the mergeable `percentile_approx`
    * sketch (accuracy `acc` ⇒ rank error ≤ n/acc). Pass 1 becomes a
    * partial+final combinable aggregate — no per-group buffer, no
    * sort, executor memory bounded by the sketch size — which is the
    * form that survives a source with 10¹⁰ documents. The threshold
    * it picks is an ACTUAL q value within the rank window of the true
    * p25; AdaptiveApproxSpec pins the resulting kept-counts against
    * the exact cut's within that window, and the gated
    * `c06b_adaptive_quality_approx` asserts the sketch contract
    * cross-engine every round.
    */
  private[queries] def adaptiveQualityApprox(docs: DataFrame,
      acc: Int = 1000): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      Text.tokenStats(col("text")).getField("_1").cast("long").as("n_tokens"),
      Text.qualityScore(col("text")).as("q"))
    val thr = base.groupBy("source")
      .agg(percentile_approx(col("q"), lit(0.25), lit(acc)).as("thr"))
    base.join(broadcast(thr), Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("q") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("q") >= col("thr"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .orderBy("source")
  }

  /** p07's production form for EXTREME source skew — the pre-trim the
    * query comment promises, as a separately-witnessed equivalence
    * (the p03 naive/bucketed pattern): membership is the top-`quota`
    * rows by (h, doc_id) within each source, and every row with
    * `h < h_bound` sorts strictly before every row with `h ≥ h_bound`,
    * so whenever the sliver `{h < h_bound}` holds ≥ quota rows it
    * provably CONTAINS the winners and local sliver rank == global
    * rank. Phase 1 therefore counts sliver membership per source (one
    * combinable aggregate — no sort, no window); phase 2 ranks only
    * the ~slack·quota-row sliver for covered sources and falls back
    * to the full rank for the rare source the bound under-covers
    * (P(under-coverage) decays exponentially in `slack` by Chernoff —
    * at slack=4 a 10⁶-row source pre-trims its window input by ~250×).
    * Result is EXACTLY `p07_temperature_mix`'s output, pinned in
    * AdaptiveMixSpec on both the fixtures and a skew fixture.
    */
  private[queries] def temperatureMixPretrim(docs: DataFrame, c: Double = 3.0,
      m: Long = 1000000L, slack: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), col("source"),
      Text.tokenStats(col("text")).getField("_1").cast("long").as("n_tokens"),
      pmod(Text.charFp(col("text")), lit(m)).as("h"))
    val quotas = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("quota",
        ceil(lit(c) * sqrt(col("n_docs").cast("double"))).cast("long"))
      .withColumn("h_bound",
        least(lit(m), ceil(lit(slack) * col("quota").cast("double")
          * lit(m.toDouble) / col("n_docs").cast("double")).cast("long")))
    val joined = base.join(broadcast(quotas), Seq("source"))
    val sliverCounts = joined.filter(col("h") < col("h_bound"))
      .groupBy("source").agg(count(lit(1)).as("n_sliver"))
    val covered = quotas.join(sliverCounts, Seq("source"), "left")
      .withColumn("pretrim_ok",
        coalesce(col("n_sliver"), lit(0L)) >= col("quota"))
      .select("source", "n_docs", "quota", "h_bound", "pretrim_ok")
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    base.join(broadcast(covered), Seq("source"))
      .filter(!col("pretrim_ok") || col("h") < col("h_bound"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(col("source"), col("n_docs"), col("quota"))
      .agg(sum(when(col("rk") <= col("quota"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= col("quota"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .select("source", "n_docs", "quota", "n_kept", "tokens_kept")
      .orderBy("source")
  }

  /** x03's bloom parameters: nominal shingle-level false-positive rate,
    * and the measured-rate gate at 4× nominal — ≥ 5σ above the binomial
    * mean at every fixture SF (the global probe pool is ≥ ~1.5k even at
    * sf0.001), so the gate only trips on a real accuracy regression.
    */
  private val BloomFpp = 0.005
  private val BloomFpBound = 0.02

  /** x03's core over a `(doc_id, source, text)` relation and an eval
    * membership predicate: build a bloom over the eval side's distinct
    * shingle fingerprints, probe every train doc's fingerprints
    * map-side, and emit per-source exact counts plus the two global
    * sketch-contract flags. Factored out so BloomDecontamSpec can drive
    * it with synthetic corpora (known overlap, adversarial fp loads).
    */
  private[queries] def bloomDecontam(raw: DataFrame, evalPred: Column,
      fpp: Double = BloomFpp, bound: Double = BloomFpBound): DataFrame =
    bloomDecontamDocs(raw.select(col("doc_id"), col("source"),
      Text.distinctShingles(col("text")).as("sh"), evalPred.as("is_eval")),
      fpp, bound)

  /** [[bloomDecontam]] over a pre-built `(doc_id, source, sh,
    * is_eval)` projection — the gated x03 passes the suite-shared
    * silver relation (r11) so its branches stop re-tokenizing the
    * corpus.
    */
  private def bloomDecontamDocs(docs: DataFrame,
      fpp: Double, bound: Double): DataFrame = {
    val evalFps = docs.filter(col("is_eval"))
      .select(explode(col("sh")).as("s"))
      .select(Text.charFp(col("s")).as("f")).distinct()
    val bf = evalFps.stat.bloomFilter("f", math.max(evalFps.count(), 1L), fpp)
    // driver-built sketch probed via the reference-object codegen
    // expression (functions/SketchProbes.scala, r12) — the map-side
    // probe stays inside whole-stage codegen, like Spark's own
    // runtime-filter bloom probe
    val nBloomHits = (fps: Column) => graft.functions.SketchProbes.bloomHits(fps, bf)
    val evalVocab = docs.filter(col("is_eval"))
      .select(explode(col("sh")).as("s")).distinct()
    val train = docs.filter(!col("is_eval"))
    val exact = train.select(col("doc_id"), explode(col("sh")).as("s"))
      .join(evalVocab, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
    val perDoc = train
      .select(col("doc_id"), col("source"), size(col("sh")).cast("long").as("n"),
        nBloomHits(Text.fps(col("sh"))).as("n_bloom"))
      .join(exact, Seq("doc_id"), "left")
      .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
    val flags = perDoc.agg(
        min(col("n_bloom") - col("n_exact")).as("min_slack"),
        sum(col("n_bloom") - col("n_exact")).as("n_fp"),
        sum(col("n") - col("n_exact")).as("n_clean"))
      .select(
        when(col("min_slack") >= 0, lit(1L)).otherwise(lit(0L)).as("no_false_neg"),
        when(col("n_fp").cast("double")
          <= col("n_clean").cast("double") * lit(bound), lit(1L))
          .otherwise(lit(0L)).as("fp_within_bound"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_train_docs"),
        sum(when(col("n_exact") > 0, 1L).otherwise(0L)).as("n_flagged_exact"))
      .crossJoin(broadcast(flags))
  }

  /** The two-phase quality-budget cut over a (doc_id, source, n_tokens,
    * q) relation. Exposed separately from the query so
    * CurationEquivalenceSpec can drive it with adversarial
    * distributions (score ties, empty buckets, single-doc sources) and
    * prove it identical to the naive whole-source window.
    */
  private[queries] def tokenBudgetCut(d: DataFrame, budget: Long,
      nBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // phase 1: per-source quality histogram → range boundaries
    // (broadcast: one small array row per source)
    val pcts = array((1 until nBuckets).map(i =>
      lit(i.toDouble / nBuckets)): _*)
    val bounds = d.groupBy("source")
      .agg(percentile_approx(col("q"), pcts, lit(1000)).as("bnds"))
    // bucket 0 = highest-q range: count of boundaries above q
    val bucketed = d.join(broadcast(bounds), "source")
      .withColumn("bkt", size(filter(col("bnds"), b => b > col("q"))))
      .drop("bnds")
    // phase 2: block-local running sums, parallel across buckets
    val localW = Window.partitionBy("source", "bkt")
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("local_cum", sum(col("n_tokens")).over(localW))
    // per-bucket base offsets: a window over #buckets rows per source
    val baseW = Window.partitionBy("source").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = bucketed.groupBy("source", "bkt")
      .agg(sum(col("n_tokens")).as("tot"))
      .select(col("source"), col("bkt"),
        (sum(col("tot")).over(baseW) - col("tot")).as("base_off"))
    local.join(bases, Seq("source", "bkt"))
      .withColumn("cum", col("base_off") + col("local_cum"))
      .filter(col("cum") <= budget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_tokens")).as("tokens_selected"),
        sum(floor(col("q") * lit(1000000.0)).cast("long")).as("sum_q_micros"))
      .orderBy("source")
  }

  /** The naive single-window budget cut — equivalence witness only
    * (sorts a whole source in one task; see tokenBudgetCut).
    */
  private[queries] def tokenBudgetCutNaive(d: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= budget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_tokens")).as("tokens_selected"),
        sum(floor(col("q") * lit(1000000.0)).cast("long")).as("sum_q_micros"))
      .orderBy("source")
  }

  def oracleSql: Map[String, String] = Map(
    "c01_contamination" ->
      s"""WITH docs AS (SELECT doc_id, source, list_distinct(${shingles(TOKS)}) AS sh FROM documents),
         |ev AS (SELECT DISTINCT unnest(sh) AS s FROM docs WHERE doc_id % 50 = 0),
         |train AS (SELECT * FROM docs WHERE doc_id % 50 <> 0),
         |tx AS (SELECT doc_id, unnest(sh) AS s FROM train),
         |hits AS (SELECT doc_id, count(*) AS n_hit FROM tx
         |  WHERE s IN (SELECT s FROM ev) GROUP BY 1),
         |frac AS (SELECT t.source,
         |    CASE WHEN len(t.sh) > 0
         |      THEN CAST(coalesce(h.n_hit, 0) AS DOUBLE) / len(t.sh)
         |      ELSE 0.0 END AS frac
         |  FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN frac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
         |  ${sumMicros("frac", "sum_frac_micros")}
         |FROM frac GROUP BY 1 ORDER BY 1""".stripMargin,

    "c03_decontaminate" ->
      s"""WITH docs AS (SELECT doc_id, source, list_distinct(${shingles(TOKS)}) AS sh,
         |    CAST(len($TOKS) AS INT) AS n_tokens FROM documents),
         |ev AS (SELECT DISTINCT unnest(sh) AS s FROM docs WHERE doc_id % 50 = 0),
         |train AS (SELECT * FROM docs WHERE doc_id % 50 <> 0),
         |tx AS (SELECT doc_id, unnest(sh) AS s FROM train),
         |hits AS (SELECT doc_id, count(*) AS n_hit FROM tx
         |  WHERE s IN (SELECT s FROM ev) GROUP BY 1),
         |frac AS (SELECT t.source, t.n_tokens,
         |    CASE WHEN len(t.sh) > 0
         |      THEN CAST(coalesce(h.n_hit, 0) AS DOUBLE) / len(t.sh)
         |      ELSE 0.0 END AS frac
         |  FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id)
         |SELECT source, count(*) AS n_train_docs,
         |  CAST(sum(CASE WHEN frac < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN frac < 0.5 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
         |  CAST(floor(CAST(sum(CASE WHEN frac < 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) * 1000000.0) AS BIGINT) AS retention_micros
         |FROM frac GROUP BY 1 ORDER BY 1""".stripMargin,

    "p03_token_budget" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(len(tk) AS INT) AS n_tokens,
         |    ${TextAnalysis.SCORE} AS q
         |  FROM (SELECT doc_id, source, $TOKS AS tk FROM documents)),
         |x AS (SELECT source, n_tokens, q,
         |  sum(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM d)
         |SELECT source, count(*) AS n_selected,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_selected,
         |  ${sumMicros("q", "sum_q_micros")}
         |FROM x WHERE cum <= 5000 GROUP BY 1 ORDER BY 1""".stripMargin,

    "p04_weighted_sample" ->
      s"""WITH d AS (SELECT source, lang, CAST(len($TOKS) AS INT) AS n_tokens,
         |    ${fp("text")} % 1000 AS h FROM documents),
         |k AS (SELECT *, CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 400
         |    WHEN 'fr' THEN 400 WHEN 'es' THEN 400 ELSE 250 END AS kpm FROM d)
         |SELECT source, lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN h < kpm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(sum(CASE WHEN h < kpm THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_sampled
         |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p05_upsample_mix" ->
      s"""WITH d AS (SELECT source, lang, CAST(len($TOKS) AS INT) AS n_tokens,
         |    CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 3 WHEN 'fr' THEN 3
         |    WHEN 'es' THEN 3 ELSE 2 END AS n_rep FROM documents),
         |x AS (SELECT source, lang, n_tokens, n_rep,
         |    unnest(range(1, n_rep + 1)) AS epoch FROM d)
         |SELECT source, lang, count(*) AS n_emitted,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_emitted,
         |  CAST(max(epoch) AS INT) AS max_epoch
         |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // exact columns + literal flags — the sketch-gate pattern (x01/x02):
    // Spark computes the flags from its own bloom, so a regression in
    // the sketch breaks the hash compare
    "x03_bloom_decontam" ->
      s"""WITH docs AS (SELECT doc_id, source, list_distinct(${shingles(TOKS)}) AS sh FROM documents),
         |ev AS (SELECT DISTINCT unnest(sh) AS s FROM docs WHERE doc_id % 50 = 0),
         |train AS (SELECT * FROM docs WHERE doc_id % 50 <> 0),
         |tx AS (SELECT doc_id, unnest(sh) AS s FROM train),
         |hits AS (SELECT doc_id, count(*) AS n_hit FROM tx
         |  WHERE s IN (SELECT s FROM ev) GROUP BY 1)
         |SELECT t.source, count(*) AS n_train_docs,
         |  CAST(sum(CASE WHEN coalesce(h.n_hit, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_exact,
         |  ${boundOk("no_false_neg")}, ${boundOk("fp_within_bound")}
         |FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same LCG weight closed form, same integer fold — bit-equal by
    // construction (fp(t) ∈ [0, 2^31) so % never sees a negative)
    "c04_classifier_filter" ->
      s"""WITH d AS (SELECT source,
         |    coalesce(list_sum([(((${fp("t")} % 256) * 1103515245 + 12345) % 2001) - 1000
         |      for t in $TOKS]), 0) AS score
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(score) AS BIGINT) AS sum_score
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // same integer comparisons, same stopword list macro — no floats
    "c05_gopher_rules" ->
      s"""WITH d AS (SELECT doc_id, source, $TOKS AS tk FROM documents),
         |m AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tok,
         |  CAST(len(list_distinct(tk)) AS BIGINT) AS n_dst,
         |  COALESCE(list_sum([CAST(len(t) AS BIGINT) for t in tk]), 0) AS len,
         |  ${stopHits("tk", "en")} AS n_stop FROM d)
         |SELECT doc_id, source, n_tok AS n_tokens,
         |  CAST((CASE WHEN n_tok >= 30 AND n_tok <= 100000 THEN 0 ELSE 1 END)
         |    + (CASE WHEN 3 * n_tok <= len AND len <= 10 * n_tok THEN 0 ELSE 2 END)
         |    + (CASE WHEN n_stop >= 2 THEN 0 ELSE 4 END)
         |    + (CASE WHEN 5 * n_dst >= n_tok THEN 0 ELSE 8 END) AS BIGINT) AS fail_bits,
         |  CAST(CASE WHEN n_tok >= 30 AND n_tok <= 100000
         |    AND 3 * n_tok <= len AND len <= 10 * n_tok
         |    AND n_stop >= 2 AND 5 * n_dst >= n_tok THEN 1 ELSE 0 END AS BIGINT) AS pass
         |FROM m ORDER BY doc_id""".stripMargin,

    // per-source p25 as the EXPLICIT rank-neighbor lerp — the same
    // IEEE op sequence as the Spark side, step for step (ADVICE r10:
    // relying on quantile_cont vs Spark's Percentile agreeing to the
    // last ULP was the one soft spot in this gate; now neither
    // engine's builtin lerp is on the path)
    "c06_adaptive_quality" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tokens,
         |    ${TextAnalysis.SCORE} AS q
         |  FROM (SELECT doc_id, source, $TOKS AS tk FROM documents)),
         |c AS (SELECT source,
         |    CAST(0.25 AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE) AS pos,
         |    CAST(floor(CAST(0.25 AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE)) AS BIGINT) AS lo
         |  FROM d GROUP BY 1),
         |r AS (SELECT source, q, row_number() OVER (PARTITION BY source ORDER BY q) AS rk FROM d),
         |t AS (SELECT r.source, min(pos) AS pos, min(lo) AS lo,
         |    min(CASE WHEN rk = lo + 1 THEN q END) AS q_lo,
         |    min(CASE WHEN rk = lo + 2 THEN q END) AS q_hi
         |  FROM r JOIN c USING (source) WHERE rk = lo + 1 OR rk = lo + 2 GROUP BY 1),
         |t2 AS (SELECT source,
         |    q_lo + (pos - CAST(lo AS DOUBLE)) * (COALESCE(q_hi, q_lo) - q_lo) AS thr FROM t)
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN q >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN q >= thr THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
         |  CAST(floor(max(thr) * 1000000.0) AS BIGINT) AS thr_micros
         |FROM d JOIN t2 ON d.source = t2.source GROUP BY 1 ORDER BY 1""".stripMargin,

    // the sketch-contract gate: the oracle asserts the bound HOLDS
    // (within_bound = 1 for every source) — the x01/x02 precedent for
    // gating an approximate operator on its published error contract
    "c06b_adaptive_quality_approx" ->
      """SELECT source, count(*) AS n_docs, CAST(1 AS BIGINT) AS within_bound
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // ceil(3·√n) per source, content-hash rank membership — all
    // arithmetic is one IEEE op per step (sqrt, multiply, ceil), no
    // cross-source float reduction anywhere
    "p07_temperature_mix" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |    ${fp("text")} % 1000000 AS h FROM documents),
         |qt AS (SELECT source, count(*) AS n_docs,
         |    CAST(ceil(3.0 * sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS quota
         |  FROM d GROUP BY 1),
         |r AS (SELECT d.source, d.n_tokens, qt.n_docs, qt.quota,
         |    row_number() OVER (PARTITION BY d.source ORDER BY h, doc_id) AS rk
         |  FROM d JOIN qt ON d.source = qt.source)
         |SELECT source, n_docs, quota,
         |  CAST(sum(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN rk <= quota THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
         |FROM r GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text
import OracleDialect._

/** The end-to-end training-data pipeline, as ONE oracle-gated query —
  * the composition proof that the individual operators (d01 exact
  * dedup, d04 LSH near-dup, t02/t03 filters, t10 split, t01 token
  * accounting) chain into the product a 100 TB corpus pipeline actually
  * ships: raw documents → exact dedup → near-dup dedup → language +
  * quality filter → train split → per-source token accounting.
  *
  * Every stage is the same code path its standalone query gates (d04's
  * [[Dedup.lshCanonicals]], t03's compiled [[Text.qualityScore]], t10's
  * hash split), so p01 green means the COMPOSITION is bit-exact too.
  *
  * Scale shape: stage boundaries are one shuffle each (digest groupBy,
  * band-bucket join, final source agg); the per-row stages (score,
  * hash, token stats) fuse into the scans. Nothing materializes the
  * corpus more than the dedup stages already require.
  */
object Pipeline {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_training_pipeline" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // 1. exact dedup: keep the smallest doc_id per content digest
      val keep = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
      val d1 = docs.join(keep.select("doc_id"), "doc_id")
      // 2. near-dup dedup: drop docs with a smaller LSH-verified near-dup
      // among the survivors. r13: the edge set is the suite-shared
      // FULL-corpus relation restricted to survivor endpoints — provably
      // identical to the survivor-corpus recompute (a doc's shingles,
      // hence its band keys, are dedup-invariant, so survivor band
      // collisions are exactly the full-corpus collisions with both
      // endpoints surviving; pair Jaccard is corpus-independent), and
      // since every edge has a_id < b_id, "has a smaller verified
      // near-dup" = "appears as some edge's b_id"
      val surv = keep.select("doc_id")
      val dropIds = Dedup.sharedEdges(s, dir)
        .join(surv.withColumnRenamed("doc_id", "a_id"), "a_id")
        .join(surv.withColumnRenamed("doc_id", "b_id"), "b_id")
        .select(col("b_id").as("doc_id")).distinct()
      val d2 = d1.join(dropIds, Seq("doc_id"), "left_anti")
        // 3. language filter (metadata column; the content heuristic is t02)
        .filter(col("lang") === "en")
      // 4.+5. quality score, token count, split hash — one fused map stage
      val st = d2.select(col("source"),
        Text.tokenStats(col("text")).getField("_1").as("n_tokens"),
        Text.qualityScore(col("text")).as("q"),
        pmod(Text.charFp(col("text")), lit(100L)).as("h100"))
      st.filter(col("q") >= 0.3 && col("h100") < 80)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(floor(col("q") * lit(1000000.0)).cast("long")).as("sum_q_micros"))
        .orderBy("source")
    }),

    // The CLEANED-CORPUS materialization (r17, verdict ask #5 — the
    // artifact a training run actually consumes, with d11's
    // quality-canonical keeper composed into the end-to-end pipeline):
    // per-doc verdicts (doc_id, kept, comp_id) where kept survivors
    // are exact-dup winners (min doc_id per digest — identical text ⇒
    // identical quality, so the quality-argmax and the id-argmin agree
    // at this stage) that are either in no near-dup component or are
    // their component's argmax-(quality DESC, doc_id) keeper — the
    // Lee-et-al keep-best step d11 gates standalone, here run inside
    // the composition. Components come from the suite-shared
    // survivor-restricted LSH edge relation (p01's provably-identical
    // restriction argument); p01's own min-id keeper remains the
    // id-deterministic variant for its token-accounting contract.
    // Scale: every stage is the same candidate-proportional shape its
    // standalone gate pins (digest groupBy, banded edges, min-label
    // rounds, tiny per-component rank windows); the final verdict join
    // is two narrow left joins against the corpus spine.
    "d12_cleaned_corpus" -> ((s, dir) => d12Verdicts(s, dir).orderBy("doc_id")),

    // The cleaned corpus AS AN ARTIFACT (r18, verdict ask #5a): d12
    // emits verdicts; a training run mounts TEXT. This gate
    // materializes d12's survivors — exact-dup winners +
    // quality-canonical component keepers, the same verdict relation —
    // into a generation-layout parquet table ([[graft.sources
    // .AtomicSwap.writeGen]]: manifest-committed, reader-safe across
    // rebuilds, exactly the lifecycle the index artifacts ride), then
    // gates a READ-BACK of that artifact: (doc_id, source, text_fp)
    // where text_fp is the portable content hash of the text AS READ
    // FROM THE ARTIFACT — so the gate pins the written corpus's
    // content, not the in-plan survivors. The oracle recomputes the
    // survivor set and fp(text) from the raw corpus.
    "d13_corpus_artifact" -> ((s, dir) => {
      val root = graft.SharedProjections.reuseArtifact("d13_corpus", dir) {
        val p = Similarity.scratchPath("d13-corpus", dir)
        val survivors = d12Verdicts(s, dir).filter(col("kept") === 1L)
          .select("doc_id")
          .join(Tables(s, dir, "documents")
            .select("doc_id", "text", "lang", "source"), "doc_id")
        graft.sources.AtomicSwap.writeGen(s, p) { gen =>
          survivors.write.mode("overwrite").parquet(gen)
        }
        p
      }
      s.read.parquet(graft.sources.AtomicSwap.dataDir(s, root))
        .select(col("doc_id"), col("source"),
          Text.charFp(col("text")).as("text_fp"))
        .orderBy("doc_id")
    }),

    // The INCREMENTAL route to the quality-canonical corpus (r18,
    // verdict ask #5b): the DocPipeline store arrives keep-first (the
    // in-order contract at DocPipeline.processBatch makes every
    // arrival-time verdict final), and quality-argmax canonicalization
    // runs as a RETRO pass over the completed store — d11's keeper
    // rank over components derived from the store's own state, never
    // from the raw corpus. Gated under d12's oracle verbatim: equality
    // proves keep-first arrival + post-hoc canonicalization ≡ the
    // batch quality-canonical verdicts. The in-order contract is
    // UNAFFECTED: canonicalization is post-hoc (a pure read of the
    // finished store), not arrival-order logic. r19 (verdict ask #4):
    // the verified edges now come from the MAINTAINED edge store the
    // pipeline appends per batch — a read — instead of re-deriving
    // lshVerifiedPairs from the store's shingle state on every run
    // (d02-class work, 8.7 s at 100×); the store equals the recompute
    // under the in-order contract (DocPipelineSpec pins it), so the
    // gate's hash is unchanged.
    "d13b_incremental_canonical" -> ((s, dir) => {
      val stateDir = replayedState(s, dir, "p06-state")
      val store = graft.streaming.DocPipeline.docsStore(s, stateDir)
        .select("doc_id", "text")
      val edges = graft.streaming.DocPipeline.edgesStore(s, stateDir)
      val q = store.select(col("doc_id"),
        Text.qualityScore(col("text")).as("q"))
      canonicalVerdicts(Tables(s, dir, "documents").select("doc_id"),
        store.select("doc_id"), edges, q)
        .orderBy("doc_id")
    }),

    // The INCREMENTAL pipeline, driver-gated: replay `documents` as
    // three deterministic micro-batches (fixed doc_id range thirds —
    // in-order, as DocPipeline enforces) through the exact per-batch
    // core the streaming foreachBatch runs (graft.streaming.DocPipeline
    // .processBatch: history anti-join exact dedup, band-key candidates
    // vs history ∪ batch, exact-Jaccard verify), then emit the per-doc
    // verdict store. Batch-boundary invariance means the result equals
    // the ORDER-FREE batch formulation the oracle expresses (p01's CTE
    // chain), so this is a hard hash gate on the incremental path —
    // including the candidatesAgainst hist⋈new shape, which only fires
    // when history is non-empty (batches 2 and 3). The batch count is
    // FIXED (3), not data-dependent: the driver-side loop stays O(1)
    // regardless of corpus size.
    "p06_incremental_replay" -> ((s, dir) => {
      graft.streaming.DocPipeline.docsStore(s, replayedState(s, dir, "p06-state"))
        .select(col("doc_id"), col("lang"), col("source"),
          when(col("is_neardup"), lit(1L)).otherwise(lit(0L)).as("is_neardup"))
        .orderBy("doc_id")
    }),

    // The incremental pipeline's SUBSTRING granularity (r14 — d10 run
    // through the streaming store): the same 3-batch replay as p06,
    // gating the per-doc (n_windows, n_kept) verdicts the winfps
    // winner store accumulates. The oracle recomputes d10's
    // overlapping-window keep-first ORDER-FREE over the exact-dedup
    // survivor corpus (the store's scope) — equality proves the
    // incremental winner bookkeeping is batch-boundary-invariant under
    // the driver's hash, not just in DocPipelineSpec.
    "p08_incremental_substring" -> ((s, dir) => {
      graft.streaming.DocPipeline.docsStore(s, replayedState(s, dir, "p08-state"))
        .select(col("doc_id"), col("n_windows"), col("n_kept"))
        .orderBy("doc_id")
    })
  )

  /** The fixed 3-batch in-order replay p06 and p08 both gate against —
    * run it, return the state directory. The replay is deterministic
    * (range batches by doc_id, the enforced in-order contract), so the
    * completed state is a derived artifact like the shared shingle
    * projection: a suite session runs it ONCE
    * (SharedProjections.reuseArtifact — r14; p06 at 100× costs ~13 s,
    * all of it this replay) while a standalone query still gets a
    * fresh, self-contained run. The scratch dir is fixed per
    * (purpose, dir) and WIPED before replay (state is mutable — it
    * must start empty, unlike the overwrite-idempotent index
    * scratches), so repeated runs leak no temp dirs.
    */
  /** d12's verdict relation, unordered — the (doc_id, kept, comp_id)
    * core the d12 gate orders and the d13 artifact filters. Shared
    * once per suite session (the components + keeper window are the
    * expensive half beyond the already-shared edge relation);
    * standalone it builds inline, d12's pre-r18 plan.
    */
  private[queries] def d12Verdicts(s: SparkSession, dir: String): DataFrame =
    graft.SharedProjections.reuse("d12_verdicts", dir) {
      val docs = Tables(s, dir, "documents")
      val keep = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
      val surv = keep.select("doc_id")
      val edges = Dedup.sharedEdges(s, dir)
        .join(surv.withColumnRenamed("doc_id", "a_id"), "a_id")
        .join(surv.withColumnRenamed("doc_id", "b_id"), "b_id")
        .select("a_id", "b_id")
      val q = docs.select(col("doc_id"), Text.qualityScore(col("text")).as("q"))
      canonicalVerdicts(docs.select("doc_id"), surv, edges, q)
    }

  /** The quality-canonical verdict shape d12 and d13b share: connected
    * components over the verified edge relation, d11's
    * argmax-(quality DESC, doc_id) keeper rank per component, and the
    * per-doc (doc_id, kept, comp_id) verdict joined onto the corpus
    * spine — kept = exact-dup winner that is either componentless or
    * its component's keeper. The callers differ only in WHERE the
    * pieces come from (raw corpus vs the incremental store's state).
    */
  private def canonicalVerdicts(spine: DataFrame, keep: DataFrame,
      edges: DataFrame, q: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = Dedup.minLabelComponents(Dedup.cp(edges))
    val ranked = comps.join(q, comps("id") === q("doc_id"))
      .select(col("lbl").as("comp_id"), col("doc_id"), col("q"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("comp_id").orderBy(col("q").desc, col("doc_id"))))
    spine.select("doc_id")
      .join(keep.select(col("doc_id"), lit(1L).as("w")), Seq("doc_id"), "left")
      .join(ranked.select("doc_id", "comp_id", "rn"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("w").isNull, lit(0L))
          .when(col("rn").isNotNull && col("rn") > 1, lit(0L))
          .otherwise(lit(1L)).as("kept"),
        coalesce(col("comp_id"), lit(-1L)).as("comp_id"))
  }

  private def replayedState(s: SparkSession, dir: String, purpose: String): String =
    graft.SharedProjections.reuseArtifact("docpipe_replay", dir) {
      val stateDir = Similarity.scratchPath(purpose, dir)
      new scala.reflect.io.Directory(new java.io.File(stateDir)).deleteRecursively()
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          md5(col("text")).as("text_hash"))
      val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
      val (cut1, cut2) = (maxId / 3, 2 * maxId / 3)
      Seq(
        docs.filter(col("doc_id") <= cut1),
        docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
        docs.filter(col("doc_id") > cut2)
      ).foreach(b => graft.streaming.DocPipeline.processBatch(b, stateDir))
      stateDir
    }

  /** The shared order-free dedup CTE chain: exact keep-first (`d1`) and
    * the LSH-verified near-dup set (`dups`) over it — p01 filters with
    * it, p06 emits its per-doc verdicts.
    */
  private val DEDUP_CTES =
    s"""keep AS (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM documents GROUP BY 1),
       |d1 AS (SELECT d.* FROM documents d JOIN keep ON d.doc_id = keep.doc_id),
       |sdocs AS (SELECT doc_id, list_distinct(${shingles(TOKS)}) AS sh FROM d1),
       |f AS (SELECT doc_id, [${fp("s")} for s in sh] AS fps FROM sdocs),
       |sig AS (SELECT doc_id, ${minhashSig("fps")} AS sig FROM f),
       |bands AS (SELECT doc_id, j, sig[j*4+1 : j*4+4] AS bkey
       |  FROM sig, (SELECT unnest(range(0, 4)) AS j)),
       |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM bands x JOIN bands y ON x.j = y.j AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM sdocs),
       |common AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(sh) AS n FROM sdocs),
       |jp AS (SELECT a_id, b_id,
       |    CAST(n_common AS DOUBLE) / (x.n + y.n - n_common) AS jaccard
       |  FROM common JOIN sizes x ON a_id = x.doc_id JOIN sizes y ON b_id = y.doc_id),
       |dups AS (SELECT DISTINCT cand.b_id AS doc_id FROM cand
       |  JOIN jp ON cand.a_id = jp.a_id AND cand.b_id = jp.b_id WHERE jp.jaccard >= 0.5)""".stripMargin

  /** The canonicalization CTE tier d12/d13 share on the oracle side:
    * DEDUP_CTES' survivor tier + the recursive components + t03's
    * exact quality expression; the keeper rank mirrors Spark's window
    * verbatim (q DESC, doc_id — the quality doubles are bit-identical
    * in both engines, d11's contract).
    */
  private val CANON_CTES =
    s"""$DEDUP_CTES,
       |edges AS (SELECT cand.a_id, cand.b_id FROM cand
       |  JOIN jp ON cand.a_id = jp.a_id AND cand.b_id = jp.b_id
       |  WHERE jp.jaccard >= 0.5),
       |verts AS (SELECT a_id AS id FROM edges UNION SELECT b_id FROM edges),
       |eb AS (SELECT a_id AS src, b_id AS dst FROM edges
       |       UNION SELECT b_id, a_id FROM edges),
       |comp(id, lbl) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT eb.dst, comp.lbl FROM comp JOIN eb ON comp.id = eb.src),
       |c AS (SELECT id AS doc_id, min(lbl) AS comp_id FROM comp GROUP BY 1),
       |t AS (SELECT doc_id, $TOKS AS tk FROM d1),
       |qs AS (SELECT doc_id, ${TextAnalysis.SCORE} AS q FROM t),
       |r AS (SELECT c.comp_id, c.doc_id,
       |    row_number() OVER (PARTITION BY c.comp_id ORDER BY qs.q DESC, c.doc_id) AS rn
       |  FROM c JOIN qs USING (doc_id))""".stripMargin

  /** d12's verdict SQL — also d13b's gate verbatim (the incremental
    * route must reproduce the batch verdicts exactly).
    */
  private val D12_SQL =
    s"""WITH RECURSIVE $CANON_CTES
       |SELECT d.doc_id,
       |  CAST(CASE WHEN k.doc_id IS NULL THEN 0
       |            WHEN r.rn > 1 THEN 0 ELSE 1 END AS BIGINT) AS kept,
       |  CAST(coalesce(r.comp_id, -1) AS BIGINT) AS comp_id
       |FROM documents d
       |LEFT JOIN keep k ON d.doc_id = k.doc_id
       |LEFT JOIN r ON d.doc_id = r.doc_id
       |ORDER BY d.doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "p01_training_pipeline" ->
      s"""WITH $DEDUP_CTES,
         |d2 AS (SELECT * FROM d1
         |  WHERE lang = 'en' AND doc_id NOT IN (SELECT doc_id FROM dups)),
         |st AS (SELECT source, CAST(len(tk) AS INT) AS n_tokens, ${TextAnalysis.SCORE} AS q,
         |    ${fp("text")} % 100 AS h100
         |  FROM (SELECT source, text, $TOKS AS tk FROM d2))
         |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  ${sumMicros("q", "sum_q_micros")}
         |FROM st WHERE q >= 0.3 AND h100 < 80 GROUP BY 1 ORDER BY 1""".stripMargin,

    // DEDUP_CTES' survivor tier + the recursive components + t03's
    // exact quality expression; the keeper rank mirrors Spark's window
    // verbatim (q DESC, doc_id — the quality doubles are bit-identical
    // in both engines, d11's contract), and the verdict spine is two
    // left joins against the full corpus
    "d12_cleaned_corpus" -> D12_SQL,

    // the artifact read-back against the raw-corpus recompute of the
    // survivor set + the portable content hash
    "d13_corpus_artifact" ->
      s"""WITH RECURSIVE $CANON_CTES
         |SELECT d.doc_id, d.source, ${fp("d.text")} AS text_fp
         |FROM documents d
         |JOIN keep k ON d.doc_id = k.doc_id
         |LEFT JOIN r ON d.doc_id = r.doc_id
         |WHERE r.rn IS NULL OR r.rn = 1
         |ORDER BY d.doc_id""".stripMargin,

    // the incremental route is gated under d12's oracle VERBATIM —
    // keep-first arrival + retro quality canonicalization must equal
    // the batch quality-canonical verdicts exactly
    "d13b_incremental_canonical" -> D12_SQL,

    // the incremental replay's final verdict store equals the order-free
    // batch formulation — the boundary-invariance contract the streaming
    // pipeline proves in DocPipelineSpec, here as a driver hash gate
    "p06_incremental_replay" ->
      s"""WITH $DEDUP_CTES
         |SELECT d1.doc_id, d1.lang, d1.source,
         |  CAST(CASE WHEN dups.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_neardup
         |FROM d1 LEFT JOIN dups ON d1.doc_id = dups.doc_id
         |ORDER BY d1.doc_id""".stripMargin,

    // d10's window CTEs (Dedup.oracleSql twin) applied to the
    // exact-dedup survivor corpus d1 — the order-free batch form of
    // the incremental winfps winner store
    "p08_incremental_substring" ->
      s"""WITH keep AS (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM documents GROUP BY 1),
         |d1 AS (SELECT d.* FROM documents d JOIN keep ON d.doc_id = keep.doc_id),
         |t AS (SELECT doc_id, $TOKS AS tk FROM d1),
         |m AS (SELECT doc_id, tk, len(tk) AS n FROM t),
         |ps AS (SELECT doc_id, tk,
         |    CASE WHEN n = 0 THEN CAST([] AS BIGINT[])
         |         WHEN n <= 40 THEN [CAST(0 AS BIGINT)]
         |         ELSE list_concat([CAST(p AS BIGINT) for p in range(0, n - 39, 20)],
         |           CASE WHEN (n - 40) % 20 = 0 THEN CAST([] AS BIGINT[])
         |                ELSE [CAST(n - 40 AS BIGINT)] END)
         |    END AS plist FROM m),
         |o AS (SELECT doc_id, p AS pos,
         |    array_to_string(tk[CAST(p + 1 AS BIGINT):CAST(p + 40 AS BIGINT)], ' ') AS wstr
         |  FROM ps, unnest(plist) AS u(p)),
         |f AS (SELECT doc_id, pos, ${fp("wstr")} AS wfp FROM o),
         |r AS (SELECT doc_id, wfp,
         |    row_number() OVER (PARTITION BY wfp ORDER BY doc_id, pos) AS rn FROM f),
         |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |  FROM r GROUP BY 1)
         |SELECT d1.doc_id, CAST(coalesce(g.n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_kept
         |FROM d1 LEFT JOIN g ON d1.doc_id = g.doc_id
         |ORDER BY d1.doc_id""".stripMargin
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}

/** SQL-surface parity: the engine's query surface is declared through
  * the Column API, and the native kernels are SQL-registered via
  * [[GraftExtensions]] — this spec proves a pure-SQL user gets the SAME
  * engine. One representative gated query per family (relational q01,
  * weather r01, text kernels t01/t04, classifier c04, sketch x05,
  * temporal w03, session-window s03, similarity v01) must optimize to
  * a plan with `sameResult` as the DataFrame form (same scans, same
  * aggregates, same kernel expressions — not merely equal output) and
  * collect identical rows; the dedup family (d04), whose plans contain
  * RDD-identity checkpoint nodes that no two independent builds can
  * share, is pinned at identical rows + native-kernel-only plan.
  */
class SqlParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val registered: Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(ext, spark)
  }

  private def assertParity(name: String, sql: String, views: Seq[String]): Unit = {
    registered
    views.foreach(t => Tables(spark, dir, t).createOrReplaceTempView(t))
    val df = SparkEntry.queries(name)(spark, dir)
    val sq = spark.sql(sql)
    assert(sq.queryExecution.optimizedPlan.sameResult(df.queryExecution.optimizedPlan),
      s"$name: SQL twin optimized to a DIFFERENT plan.\n--- DataFrame:\n" +
        s"${df.queryExecution.optimizedPlan}\n--- SQL:\n${sq.queryExecution.optimizedPlan}")
    assert(sq.collect().map(_.toSeq).toSeq === df.collect().map(_.toSeq).toSeq, name)
  }

  test("q01 pricing summary: SQL twin has the same optimized plan and rows") {
    // the e2 sums mirror the r20 integer-cents rewrite (Relational.sumE2
    // — bit-identical to the decimal form per CentsExactnessSpec); the
    // e4 revenue product stays decimal, as in the engine
    assertParity("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= CAST('2000-01-01' AS TIMESTAMP)
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      Seq("lineitem"))
  }

  test("t01 token stats: SQL twin through graft_tokenstats matches plan and rows") {
    assertParity("t01_token_stats",
      // the sort sits below the kernel, mirroring the round-10
      // sort-below-kernel query shape (see t08's scaladoc)
      """SELECT doc_id, st._1 AS n_tokens, st._2 AS n_distinct,
        | CAST(st._3 AS DOUBLE) / st._1 AS avg_token_len,
        | CAST(st._2 AS DOUBLE) / st._1 AS type_token_ratio
        |FROM (SELECT doc_id, graft_tokenstats(text) AS st
        |  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id))""".stripMargin,
      Seq("documents"))
  }

  test("r01 weather flagship: SQL twin (adapter CTE + broadcast anchor) matches") {
    assertParity("r01_weather_avg_province",
      """WITH w AS (SELECT user_id % 146 AS location_id,
        |    concat('P', CAST((user_id % 146) % 30 AS STRING)) AS province_name,
        |    value AS temperature_c, ts AS data_datetime FROM events),
        |m AS (SELECT max(data_datetime) AS mx FROM w)
        |SELECT /*+ BROADCAST(m) */ province_name,
        |  round(avg(temperature_c), 4) AS avg_temp_c, count(1) AS n_obs
        |FROM w, m WHERE data_datetime >= mx - INTERVAL 24 HOURS
        |GROUP BY province_name ORDER BY avg_temp_c DESC, province_name""".stripMargin,
      Seq("events"))
  }

  test("t04 fingerprint: SQL twin through graft_charfp/graft_fps/graft_shingles matches") {
    assertParity("t04_doc_fingerprint",
      """SELECT doc_id, graft_charfp(text) AS full_hash,
        | array_min(graft_fps(sh)) AS min_shingle_fp,
        | size(sh) AS n_shingles
        |FROM (SELECT doc_id, text, graft_shingles(text) AS sh
        |  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id))""".stripMargin,
      Seq("documents"))
  }

  // The dedup family checkpoints its candidate relations (lazy
  // localCheckpoint — lineage truncation for the iterative consumers),
  // and a checkpoint is an RDD-identity plan node: two independently
  // built plans can never be `sameResult` across one. d04's parity is
  // therefore gated at the strongest achievable level — identical rows,
  // AND the SQL twin's plan must run on the SAME native kernels
  // (MinHashSig/FpsExpr/DistinctShingles, no UDF fallback).
  test("d04 minhash dedup: pure-SQL twin (graft_shingles/fps/minhash) matches rows on kernels") {
    registered
    Tables(spark, dir, "documents").createOrReplaceTempView("documents")
    val sql =
      """WITH d AS (SELECT doc_id, graft_shingles(text) AS sh FROM documents),
        |bands AS (SELECT doc_id, b.j AS j, b.bkey AS bkey FROM (
        |    SELECT doc_id, explode(array(
        |      struct(0 AS j, slice(sig, 1, 4) AS bkey),
        |      struct(1 AS j, slice(sig, 5, 4) AS bkey),
        |      struct(2 AS j, slice(sig, 9, 4) AS bkey),
        |      struct(3 AS j, slice(sig, 13, 4) AS bkey))) AS b
        |    FROM (SELECT doc_id, graft_minhash(graft_fps(sh)) AS sig FROM d))),
        |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM bands x JOIN bands y
        |  ON x.j = y.j AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        |exc AS (SELECT doc_id, size(sh) AS n, explode(sh) AS s FROM d
        |  LEFT SEMI JOIN (SELECT a_id AS doc_id FROM cand
        |                  UNION ALL SELECT b_id FROM cand) USING (doc_id)),
        |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.n AS na, b.n AS nb,
        |    count(1) AS n_common
        |  FROM exc a JOIN exc b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n, b.n),
        |verified AS (SELECT a_id, b_id FROM pairs
        |  LEFT SEMI JOIN cand USING (a_id, b_id)
        |  WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5)
        |SELECT b_id AS doc_id, min(a_id) AS canonical_id FROM verified
        |GROUP BY b_id ORDER BY doc_id""".stripMargin
    val sq = spark.sql(sql)
    val plan = sq.queryExecution.optimizedPlan.toString
    Seq("graft_minhash", "graft_fps", "graft_shingles").foreach(k =>
      assert(plan.contains(k), s"SQL twin lost the native $k kernel:\n$plan"))
    assert(!plan.contains("ScalaUDF"), s"SQL twin fell back to a UDF:\n$plan")
    val df = SparkEntry.queries("d04_minhash_lsh_dedup")(spark, dir)
    assert(sq.collect().map(_.toSeq).toSeq === df.collect().map(_.toSeq).toSeq, "d04 rows")
  }

  // x04's CMS probe is a driver-held sketch object (no SQL surface can
  // express it — same boundary as Spark's own runtime bloom filters),
  // so the sketch-family parity pin is x05: pure hll_sketch_agg /
  // hll_union_agg SQL, full sameResult + rows.
  test("x05 hll union: SQL twin has the same optimized plan and rows") {
    // subqueries are deliberately inlined, not CTEs: CTE inlining
    // introduces re-alias Projects that survive canonicalization and
    // defeat sameResult even when the plans are otherwise identical
    val bound = s"${3 * graft.queries.TextAnalysis.HllRsd}D"
    assertParity("x05_hll_union",
      s"""SELECT source, exact_distinct,
        |  CASE WHEN abs(CAST(est AS DOUBLE) - CAST(exact_distinct AS DOUBLE))
        |    <= greatest(CAST(exact_distinct AS DOUBLE) * $bound, 1.0D)
        |  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS within_bound
        |FROM (
        |  SELECT source, count(DISTINCT fp) AS exact_distinct,
        |    hll_sketch_estimate(hll_sketch_agg(fp, 12)) AS est
        |  FROM (SELECT source, graft_charfp(text) AS fp FROM documents)
        |  GROUP BY source
        |  UNION ALL
        |  SELECT 'ALL' AS source, exact_distinct, hll_sketch_estimate(sk) AS est
        |  FROM (SELECT hll_union_agg(sk, false) AS sk
        |        FROM (SELECT hll_sketch_agg(fp, 12) AS sk
        |              FROM (SELECT source, graft_charfp(text) AS fp FROM documents)
        |              GROUP BY source))
        |  CROSS JOIN (SELECT count(DISTINCT fp) AS exact_distinct
        |              FROM (SELECT graft_charfp(text) AS fp FROM documents))
        |) ORDER BY source""".stripMargin,
      Seq("documents"))
  }

  // temporal-family pin: the interval join is pure SQL (watermarks are
  // analyzer-eliminated in batch, so the optimized plans align)
  test("w03 interval join: SQL twin has the same optimized plan and rows") {
    assertParity("w03_interval_join",
      """SELECT user_id, purchase_id, click_id, purchase_ts, click_ts
        |FROM (SELECT user_id, ts AS click_ts, event_id AS click_id
        |      FROM events WHERE event_type = 'click')
        |JOIN (SELECT user_id AS p_user_id, ts AS purchase_ts, event_id AS purchase_id
        |      FROM events WHERE event_type = 'purchase')
        |ON user_id = p_user_id AND click_ts <= purchase_ts
        |  AND click_ts >= purchase_ts - INTERVAL 60 MINUTES
        |ORDER BY user_id, purchase_id, click_id""".stripMargin,
      Seq("events"))
  }

  // streaming-adjacent pin: the native session_window group key is
  // plain SQL, so the merge-on-overlap sessionization a pure-SQL user
  // writes runs the identical plan
  test("s03 session window: SQL twin has the same optimized plan and rows") {
    assertParity("s03_session_window",
      """SELECT user_id, session_window.start AS session_start,
        |  session_window.end AS session_end, n_events, sum_value
        |FROM (SELECT user_id, session_window, count(1) AS n_events,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |  FROM events GROUP BY user_id, session_window(ts, '15 minutes'))
        |ORDER BY user_id, session_start""".stripMargin,
      Seq("events"))
  }

  // similarity-family pin: brute-force kNN through graft_dot with the
  // broadcast hint — the query a pure-SQL user would write for v01
  test("v01 knn exact: SQL twin through graft_dot matches plan and rows") {
    assertParity("v01_knn_exact",
      """SELECT q_id, rank, neighbor_id, cosine FROM (
        |  SELECT q_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM (
        |    SELECT /*+ BROADCAST(q) */ q.q_id, e.vec_id AS neighbor_id,
        |      graft_dot(q.qv, e.v) / (q.qn * e.nrm) AS cosine
        |    FROM (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm
        |          FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
        |                FROM embeddings)) e
        |    CROSS JOIN (SELECT vec_id AS q_id, v AS qv, sqrt(graft_dot(v, v)) AS qn
        |          FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
        |                FROM embeddings WHERE vec_id >= 0 AND vec_id < 20)) q
        |    WHERE e.vec_id != q.q_id))
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
      Seq("embeddings"))
  }

  test("c04 classifier filter: SQL twin through graft_classifier matches") {
    assertParity("c04_classifier_filter",
      """SELECT source, count(1) AS n_docs,
        | sum(CASE WHEN score > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS n_kept,
        | sum(score) AS sum_score
        |FROM (SELECT source, graft_classifier(text) AS score FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin,
      Seq("documents"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}

/** SQL-surface parity: the engine's query surface is declared through
  * the Column API, and the native kernels are SQL-registered via
  * [[GraftExtensions]] — this spec proves a pure-SQL user gets the SAME
  * engine: for representative gated queries (one relational, two
  * through the `graft_*` kernel functions), the `spark.sql` twin must
  * optimize to a plan with `sameResult` as the DataFrame form (same
  * scans, same aggregates, same kernel expressions — not merely equal
  * output) and collect identical rows.
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
    assertParity("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
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
      """SELECT doc_id, st._1 AS n_tokens, st._2 AS n_distinct,
        | CAST(st._3 AS DOUBLE) / st._1 AS avg_token_len,
        | CAST(st._2 AS DOUBLE) / st._1 AS type_token_ratio
        |FROM (SELECT doc_id, graft_tokenstats(text) AS st FROM documents)
        |ORDER BY doc_id""".stripMargin,
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
        |FROM (SELECT doc_id, text, graft_shingles(text) AS sh FROM documents)
        |ORDER BY doc_id""".stripMargin,
      Seq("documents"))
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

package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSessionExtensions}

class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after extension registration") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlBridge.registerFunctions(ext, spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head.getDouble(0)
    assert(r === 32.0)
    // type check surfaces as an analysis error, not a runtime crash
    val err = intercept[Exception] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<double>"))
  }

  test("graft_quantize_i8 / graft_long_dot are callable from SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlBridge.registerFunctions(ext, spark)
    // unit-x vector, nrm 1: codes (127, 0), self-dot 127² = 16129
    val r = spark.sql(
      "SELECT graft_long_dot(c, c) AS d FROM (SELECT " +
        "graft_quantize_i8(array(1.0d, 0.0d), 1.0d) AS c)")
      .head.getLong(0)
    assert(r === 16129L)
  }

  test("graft_cms_weighted is callable from SQL; sketch equals the builtin") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlBridge.registerFunctions(ext, spark)
    import spark.implicits._
    Seq(("a", 3L), ("b", 2L), ("a", 1L)).toDF("item", "c")
      .createOrReplaceTempView("cms_in")
    // 2-arg form (x04's eps/conf/seed defaults) and the explicit 5-arg
    // form must agree with count_min_sketch over the expanded multiset
    val rows = spark.sql(
      """SELECT graft_cms_weighted(item, c) AS w2,
        |  graft_cms_weighted(item, c, 0.001d, 0.99d, 42) AS w5
        |FROM cms_in""".stripMargin).head
    val expanded = Seq.fill(4)("a") ++ Seq.fill(2)("b")
    val builtin = expanded.toDF("item")
      .agg(org.apache.spark.sql.functions.expr(
        "count_min_sketch(item, 0.001d, 0.99d, 42)")).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(rows.getAs[Array[Byte]](0), builtin))
    assert(java.util.Arrays.equals(rows.getAs[Array[Byte]](1), builtin))
    // non-literal sketch params are rejected at analysis, not silently
    intercept[Exception] {
      spark.sql("SELECT graft_cms_weighted(item, c, c, 0.99d, 42) FROM cms_in").collect()
    }
  }

  test("graft_window_fps is callable from SQL and matches the JVM kernel") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlBridge.registerFunctions(ext, spark)
    val text = (0 until 90).map(i => s"t$i").mkString(" ")
    val got = spark.sql(s"SELECT graft_window_fps('$text') AS w").head.getSeq[Long](0)
    assert(got === graft.functions.Text.windowFpsArr(text, 40, 20).toSeq)
  }

  test("graft_charfp (native codegen) matches the JVM kernel and handles nulls") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlBridge.registerFunctions(ext, spark)
    val r = spark.sql(
      "SELECT graft_charfp('hello world') AS h, graft_charfp(CAST(NULL AS STRING)) AS n")
      .head
    assert(r.getLong(0) === graft.functions.Text.charFpStr("hello world"))
    assert(r.isNullAt(1))
    // parity over many strings through a real scan (codegen path), vs kernel
    import spark.implicits._
    val strs = (0 until 500).map(i => s"doc $i body ${"x" * (i % 37)}")
    val viaExpr = strs.toDF("s")
      .select(graft.functions.Text.charFp(org.apache.spark.sql.functions.col("s")))
      .collect().map(_.getLong(0))
    assert(viaExpr.toSeq === strs.map(graft.functions.Text.charFpStr))
  }
}

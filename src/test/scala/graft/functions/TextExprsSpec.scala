package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native FpsExpr/SimHash32 vs the UDF kernels they replaced. */
class TextExprsSpec extends SparkSpec {

  import spark.implicits._

  test("fps matches the per-element kernel; empty stays empty, null stays null") {
    val rows = Seq(
      (1L, Seq("a b c", "b c d", "weather report")),
      (2L, Seq.empty[String]))
    val df = rows.toDF("id", "sh")
      .union(Seq((3L, null.asInstanceOf[Seq[String]])).toDF("id", "sh"))
    val out = df.select(col("id"), Text.fps(col("sh")).as("f"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(out(1L) === rows.head._2.map(Text.charFpStr))
    assert(out(2L) === Seq.empty[Long])
    assert(out(3L) === null)
  }

  test("simhash32 matches the kernel on random sets; empty -> 0, null -> null") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(100)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % Text.P)))
    val df = rows.toDF("id", "fps")
    val got = df.select(col("id"), Text.simhash32(col("fps")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, fps) =>
      assert(got(id) === Text.simhashOf(fps.toArray), s"id=$id")
    }
    val edge = Seq((1L, Seq.empty[Long])).toDF("id", "fps")
      .union(Seq((2L, null.asInstanceOf[Seq[Long]])).toDF("id", "fps"))
      .select(col("id"), Text.simhash32(col("fps")).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(edge(1L) === 0L)
    assert(edge(2L) === null)
  }

  test("distinctShingles (native) matches the string kernel incl. short/null docs") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two", "", "a a a a a", "x y z x y z x y")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .union(Seq((99L, null.asInstanceOf[String])).toDF("id", "text"))
    val out = df.select(col("id"), Text.distinctShingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(out(i.toLong) === Text.distinctShinglesStr(t, 3).toSeq, s"text=$t")
    }
    assert(out(99L) === null)
  }

  test("native segments/probes expressions match the Scala kernels incl. null") {
    import org.apache.spark.sql.functions.col
    val keys = Seq("abcdefghijklm", "short", "", "exactly forty characters of key material")
    val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
      .union(Seq((99L, null.asInstanceOf[String])).toDF("id", "k"))
    val segs = df.select(col("id"), Segments.segments(col("k")).as("g")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getString(1)))))
      .toMap
    val probes = df.select(col("id"), Segments.probes(col("k")).as("g")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getInt(1), x.getString(2)))))
      .toMap
    keys.zipWithIndex.foreach { case (k, i) =>
      assert(segs(i.toLong) === Segments.segmentsOf(k, Segments.Tau).toSeq, s"k=$k")
      assert(probes(i.toLong) === Segments.probesOf(k, Segments.Tau).toSeq, s"k=$k")
    }
    assert(segs(99L) === null)
    assert(probes(99L) === null)
  }

  test("graft_segments / graft_probes are callable from SQL") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(ext, spark)
    val n = spark.sql("SELECT size(graft_segments('abcdefghij')) AS n")
      .collect().head.getInt(0)
    assert(n === Segments.Tau + 1)
    val p = spark.sql("SELECT size(graft_probes('abcdefghij')) AS n")
      .collect().head.getInt(0)
    assert(p === Segments.probesOf("abcdefghij", Segments.Tau).length)
  }

  test("queryTf kernel == tokens-HOF + array_remove formulation (t14 parity)") {
    import org.apache.spark.sql.functions._
    val terms = Seq("dup", "vector", "spark")
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900001L, "dup dup DUP Vector  spark   dup"), // case + multi-space
        (900002L, ""),                                // empty doc
        (900003L, "   "),                             // whitespace only
        (900004L, "no query terms here at all")
      ).toDF("doc_id", "text"))
    val tk = Text.tokens(col("text"))
    val naive = docs.select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"), size(col("tk")).as("dl"),
        (size(col("tk")) - size(array_remove(col("tk"), terms(0)))).as("tf0"),
        (size(col("tk")) - size(array_remove(col("tk"), terms(1)))).as("tf1"),
        (size(col("tk")) - size(array_remove(col("tk"), terms(2)))).as("tf2"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val kernel = docs
      .select(col("doc_id"), Text.queryTf(col("text"), terms).as("q"))
      .select(col("doc_id"), col("q.dl").as("dl"),
        col("q.tf")(0).as("tf0"), col("q.tf")(1).as("tf1"), col("q.tf")(2).as("tf2"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(kernel.keySet === naive.keySet)
    kernel.foreach { case (id, v) => assert(v === naive(id), s"doc $id") }
    // codegen-inlined, and lowercase matching caught the cased tokens
    val plan = docs.select(Text.queryTf(col("text"), terms))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_querytf")), plan)
    assert(kernel(900001L) === Seq(6, 4, 1, 1))
  }

  test("graft_fps and graft_simhash are callable from SQL") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(ext, spark)
    val r = spark.sql(
      "SELECT graft_simhash(graft_fps(array('a b c', 'x y z'))) AS s").collect().head.getLong(0)
    assert(r === Text.simhashOf(Array(Text.charFpStr("a b c"), Text.charFpStr("x y z"))))
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native-codegen MinHashSig vs the UDF kernel it replaced: identical
  * signatures on random inputs, null/empty semantics preserved, and
  * both the interpreted (nullSafeEval) and codegen paths exercised.
  */
class MinHashSigSpec extends SparkSpec {

  import spark.implicits._

  private def udfSig(k: Int) =
    udf((xs: Seq[Long]) =>
      if (xs == null || xs.isEmpty) null else Text.minhashOf(xs.toArray, k))

  test("native signature matches the kernel on random fingerprint sets") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong().abs % Text.P)))
    val df = rows.toDF("id", "fps")
    val got = df.select(col("id"), Text.minhashSig(col("fps")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.select(col("id"), udfSig(16)(col("fps")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got === want)
  }

  test("null and empty inputs produce null signatures") {
    val df = Seq((1L, Seq.empty[Long]), (2L, Seq(42L)))
      .toDF("id", "fps")
      .union(Seq((3L, null.asInstanceOf[Seq[Long]])).toDF("id", "fps"))
    val out = df.select(col("id"), Text.minhashSig(col("fps")).as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(out(1L) === null)
    assert(out(3L) === null)
    assert(out(2L) !== null)
  }

  test("graft_minhash is callable from SQL after extension registration") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(ext, spark)
    val r = spark.sql("SELECT graft_minhash(array(1L, 2L, 3L)) AS sig")
      .collect().head.getSeq[Long](0)
    assert(r.length === 16)
    assert(r === Text.minhashOf(Array(1L, 2L, 3L), 16).toSeq)
  }
}

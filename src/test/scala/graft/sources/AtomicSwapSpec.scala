package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Healing of PRE-R17 artifacts interrupted mid-rename-swap (the r16
  * compact mechanism, since replaced by the generation layout —
  * ManifestSpec): BOTH legacy crash windows recover to a complete copy
  * on the next read, which is what lets `heal` migrate any pre-r17
  * artifact state safely.
  */
class AtomicSwapSpec extends SparkSpec {

  import spark.implicits._

  private def vals(path: String): Seq[Long] =
    spark.read.parquet(path).as[Long].collect().sorted.toSeq

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("crash after rename(live, old): committed .compact wins on recover") {
    val path = Files.createTempDirectory("swapw1").toString + "/rel"
    Seq(1L, 2L).toDF("x").write.parquet(path)
    // simulate the window: the new store committed at .compact (with
    // _SUCCESS), the live path already renamed away
    Seq(7L, 8L).toDF("x").write.parquet(path + ".compact")
    fs.rename(new Path(path), new Path(path + ".old"))
    AtomicSwap.recover(spark, path)
    assert(vals(path) === Seq(7L, 8L))
    assert(!fs.exists(new Path(path + ".old")))
  }

  test("crash before the rewrite committed: .old wins on recover") {
    val path = Files.createTempDirectory("swapw2").toString + "/rel"
    Seq(1L, 2L).toDF("x").write.parquet(path)
    // simulate: rewrite started but never committed (no _SUCCESS), live
    // already renamed away — recovery must restore the untouched old
    Seq(9L).toDF("x").write.parquet(path + ".compact")
    fs.delete(new Path(path + ".compact/_SUCCESS"), false)
    fs.rename(new Path(path), new Path(path + ".old"))
    AtomicSwap.recover(spark, path)
    assert(vals(path) === Seq(1L, 2L))
    assert(!fs.exists(new Path(path + ".compact")))
  }
}

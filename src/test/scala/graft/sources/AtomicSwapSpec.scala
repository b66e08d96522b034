package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The crash-safe compact swap (r16, ADVICE — replaces the
  * localCheckpoint+overwrite-in-place form that held the only copy of
  * an index in unreplicated executor state): a completed swap replaces
  * the directory with no stray siblings, and BOTH mid-swap crash
  * windows recover to a complete copy on the next read.
  */
class AtomicSwapSpec extends SparkSpec {

  import spark.implicits._

  private def vals(path: String): Seq[Long] =
    spark.read.parquet(path).as[Long].collect().sorted.toSeq

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("completed swap replaces contents and leaves no siblings") {
    val path = Files.createTempDirectory("swap").toString + "/rel"
    Seq(1L, 2L, 3L).toDF("x").write.parquet(path)
    AtomicSwap.swapIn(spark, path) { tmp =>
      Seq(4L, 5L).toDF("x").write.parquet(tmp)
    }
    assert(vals(path) === Seq(4L, 5L))
    assert(!fs.exists(new Path(path + ".compact")))
    assert(!fs.exists(new Path(path + ".old")))
  }

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

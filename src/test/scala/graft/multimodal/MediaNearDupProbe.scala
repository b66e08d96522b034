package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): m03's cost decomposition at the
  * 100× replica — how much of the gate's wall is the in-gate fixture
  * (painting + BMP-encoding 500k images, an artifact a real deployment
  * never pays: its images already exist) vs the operator itself
  * (decode → avgHash → banded hamming join). Three walls, min of 2,
  * noop sink:
  *
  *   - fixture: attachMediaNearDup alone (paint + encode);
  *   - hashes:  fixture + decode + avgHash (the fingerprint pass);
  *   - full:    the m03 pipeline incl. the banded join.
  *
  *   sbt "Test/runMain graft.multimodal.MediaNearDupProbe [dir]"
  */
object MediaNearDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    def fixture = Multimodal.attachMediaNearDup(docs)
    val tFix = Seq.fill(2)(time(
      fixture.write.format("noop").mode("overwrite").save())).min
    val tHash = Seq.fill(2)(time(
      Multimodal.perceptualHashes(fixture)
        .write.format("noop").mode("overwrite").save())).min
    val tFull = Seq.fill(2)(time(
      Multimodal.mediaNearDupPairs(Multimodal.perceptualHashes(fixture))
        .write.format("noop").mode("overwrite").save())).min
    val nPairs = Multimodal.mediaNearDupPairs(
      Multimodal.perceptualHashes(fixture)).count()
    println(f"[medianeardupprobe] $dir: fixture=$tFix%.1fs " +
      f"hashes=$tHash%.1fs full=$tFull%.1fs pairs=$nPairs%,d " +
      f"(decode+hash ~= ${tHash - tFix}%.1fs, join ~= ${tFull - tHash}%.1fs)")
    spark.stop()
  }
}

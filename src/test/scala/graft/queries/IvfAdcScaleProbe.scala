package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the IVFADC probe-fraction line
  * at the 100× replica (r14, verdict ask #1's "Done" criterion) —
  * builds the flat-PQ index (v11's production form) and the IVFADC
  * index ONCE each (off the serving path, timed separately), then
  * interleaves WARM serving passes: flat full-scan ADC vs probed
  * IVFADC at the shipped nprobe. The serving delta is the
  * nprobe/nlist scan-fraction win; hit parity vs exact ground truth
  * rides along so the speed line can't hide a recall collapse.
  *
  *   sbt "Test/runMain graft.queries.IvfAdcScaleProbe target/scaled/sf10salt"
  */
object IvfAdcScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    // nlist dial: at the gate's 16 a 10-query batch probes the UNION of
    // ~all lists and fixed scan overhead hides the fraction win; the
    // production regime (nlist ≈ √n) is where a probe touches a sliver
    val nlist = args.lift(1).flatMap(_.toIntOption).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val qPred = col("vec_id") >= 300 && col("vec_id") < 310
    val base = java.nio.file.Files.createTempDirectory("ivfadc-scale").toString
    val flatPath = s"$base/flat"
    val adcPath = s"$base/adc"
    val (_, tFlatBuild) = time(Similarity.buildPqIndex(spark, dir, flatPath))
    val (_, tAdcBuild) = time(
      Similarity.buildIvfAdcIndex(spark, dir, adcPath, nlist = nlist))
    println(f"[ivfadcscale] dir=$dir nlist=$nlist build_flat=$tFlatBuild%.1fs " +
      f"build_ivfadc=$tAdcBuild%.1fs")
    val gt = Similarity.exactTopKWhere(spark, dir, qPred, 3)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // what the probed scan READS vs the flat scan — the structural
    // probe-fraction win (wall at this replica is fixed-overhead-bound:
    // the whole code relation is a few MB)
    val codes = graft.sources.PqIndex.read(spark, adcPath)
    val nAll = codes.count()
    val probed1 = codes.filter(col("c_id").isin(
      (0 until Similarity.V12Nprobe).map(_.toLong): _*))
    val files1 = probed1.select(input_file_name()).distinct().count()
    val rows1 = probed1.count()
    val filesAll = codes.select(input_file_name()).distinct().count()
    println(f"[ivfadcscale] scan accounting: one ${Similarity.V12Nprobe}-probe query " +
      f"reads $rows1%d of $nAll%d code rows (${100.0 * rows1 / nAll}%.1f%%), " +
      f"$files1%d of $filesAll%d files")
    for (pass <- 1 to 3) {
      val (flatRows, tFlat) = time(
        Similarity.knnPqIndexed(spark, dir, flatPath, qPred, frontier = 50)
          .select("q_id", "neighbor_id").collect())
      val (adcRows, tAdc) = time(
        Similarity.ivfAdcServe(spark, dir, adcPath,
            nprobe = Similarity.V12Nprobe, frontier = Similarity.V12Frontier, qPred)
          .select("q_id", "neighbor_id").collect())
      val hFlat = gt.intersect(flatRows.map(r => (r.getLong(0), r.getLong(1))).toSet).size
      val hAdc = gt.intersect(adcRows.map(r => (r.getLong(0), r.getLong(1))).toSet).size
      println(f"[ivfadcscale] pass=$pass serve_flat=$tFlat%.2fs serve_ivfadc=$tAdc%.2fs " +
        f"hits_flat=$hFlat%d/30 hits_ivfadc=$hAdc%d/30")
      // single-query serving — the latency regime where the probed
      // union is nprobe/nlist of the table rather than most of it
      val one = col("vec_id") === 300
      val (_, tFlat1) = time(
        Similarity.knnPqIndexed(spark, dir, flatPath, one, frontier = 50)
          .select("q_id", "neighbor_id").collect())
      val (_, tAdc1) = time(
        Similarity.ivfAdcServe(spark, dir, adcPath,
            nprobe = Similarity.V12Nprobe, frontier = Similarity.V12Frontier, one)
          .select("q_id", "neighbor_id").collect())
      println(f"[ivfadcscale] pass=$pass single-query serve_flat=$tFlat1%.2fs " +
        f"serve_ivfadc=$tAdc1%.2fs")
    }
    spark.stop()
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
  }
}

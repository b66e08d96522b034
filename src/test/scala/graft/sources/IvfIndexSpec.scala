package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the persisted IVF layout actually prunes: a probe of 2 of 8
  * centroids must (a) return exactly the rows a full-scan filter would,
  * and (b) read ONLY files under the probed `c_id=` directories —
  * checked at execution level via `input_file_name()`, not just plan
  * text.
  */
class IvfIndexSpec extends SparkSpec {

  import spark.implicits._

  test("probe reads only the probed centroid partitions (pruned scan)") {
    val path = Files.createTempDirectory("ivf").resolve("idx").toString
    // the REAL assignment relation v02 computes, persisted
    val assign = graft.queries.Similarity.ivfAssign(spark, "/root/testdata/sf0.001")
    IvfIndex.write(assign, path)

    val probed = IvfIndex.probe(spark, path, Seq(2L, 5L))

    // (a) correctness: same rows as filtering a full scan
    val expect = assign.filter(col("c_id").isin(2L, 5L))
      .select("vec_id").as[Long].collect().sorted
    assert(probed.select("vec_id").as[Long].collect().sorted === expect)

    // (b) pruning: every file actually read lives under c_id=2 or c_id=5
    val files = probed.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("c_id=2") || f.contains("c_id=5")),
      s"unpruned files: ${files.filterNot(f => f.contains("c_id=2") || f.contains("c_id=5")).mkString(", ")}")

    // and the pruning is static (in the scan's partition filters, not a
    // post-scan Filter): the plan pushes c_id into PartitionFilters
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }

  test("compact collapses append files to one per list; rows identical") {
    val path = Files.createTempDirectory("ivfc").resolve("idx").toString
    val assign = graft.queries.Similarity.ivfAssign(spark, "/root/testdata/sf0.001")
    // build on a third, then two appends (each lands one file per
    // touched c_id= directory — the accretion IvfIndex.compact sweeps)
    IvfIndex.write(assign.filter(col("vec_id") % 3 === 0), path)
    for (m <- Seq(1, 2))
      assign.filter(col("vec_id") % 3 === m)
        .repartition(col("c_id"))
        .write.mode("append").partitionBy("c_id")
        .parquet(AtomicSwap.dataDir(spark, path))

    def rows: Seq[(Long, Long)] = IvfIndex.read(spark, path)
      .select("vec_id", "c_id").as[(Long, Long)].collect().sorted.toSeq
    def filesPerDir: Map[String, Int] = {
      // inspect the CURRENT generation (r17 manifest layout)
      val root = new java.io.File(AtomicSwap.dataDir(spark, path))
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("c_id="))
        .map(d => d.getName ->
          d.listFiles().count(f => f.getName.endsWith(".parquet"))).toMap
    }

    val before = rows
    assert(filesPerDir.values.exists(_ > 1),
      "appends should leave multiple files per list directory")
    IvfIndex.compact(spark, path)
    assert(rows === before, "compact must not change the indexed rows")
    assert(filesPerDir.values.forall(_ == 1),
      s"compact should leave one file per list: $filesPerDir")
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Vectors

/** Proves the persisted int8 code index earns its keep: candidates
  * served from the index are bit-identical to the inline phase-1
  * computation, a scan of the index never touches a float file, and
  * the index is materially smaller on disk than the float relation.
  */
class I8IndexSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("index-served candidates are identical to the inline quantized scan") {
    val root = Files.createTempDirectory("i8idx")
    val idxPath = root.resolve("codes").toString
    val emb = graft.Tables(spark, sfDir, "embeddings")
    I8Index.write(emb, idxPath)

    def topCands(codes: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
      val q = codes.filter(col("vec_id") >= 300 && col("vec_id") < 310)
        .select(col("vec_id").as("q_id"), col("qc").as("qqc"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("qdot").desc, col("neighbor_id"))
      codes.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          Vectors.longDot(col("qqc"), col("qc")).as("qdot"))
        .withColumn("crk", row_number().over(w)).filter(col("crk") <= 20)
        .select("q_id", "neighbor_id", "qdot")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    }

    val fromIndex = topCands(I8Index.read(spark, idxPath))
    val inline = topCands(I8Index.codes(emb))
    assert(fromIndex === inline)
    assert(fromIndex.size === 200, s"10 queries x top-20, got ${fromIndex.size}")
  }

  test("a scan of the index reads only index files, and they are smaller than the floats") {
    val root = Files.createTempDirectory("i8sz")
    val idxPath = root.resolve("codes").toString
    val floatPath = root.resolve("floats").toString
    val emb = graft.Tables(spark, sfDir, "embeddings")
    I8Index.write(emb, idxPath)
    // the float relation phase 2 would fetch from, as its own table
    emb.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(floatPath)

    val files = I8Index.read(spark, idxPath)
      .select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(_.contains("codes")), s"scan touched non-index files: ${files.mkString(", ")}")

    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val (idxB, fltB) = (dirBytes(idxPath), dirBytes(floatPath))
    assert(idxB > 0 && fltB > 0)
    // 64-dim float32 = 256 B/row raw vs int8 codes ≤ 64 B encoded;
    // parquet framing narrows the gap at this tiny SF, so assert the
    // conservative bound — the index must be meaningfully smaller
    assert(idxB * 3 < fltB * 2, s"index $idxB B not materially smaller than floats $fltB B")
  }
}

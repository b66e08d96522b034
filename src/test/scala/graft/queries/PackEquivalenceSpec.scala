package graft.queries

import graft.SparkSpec

/** The packing identity: the skew-safe two-level salted prefix sum
  * (t11, the declared query) must be bit-identical to the naive
  * whole-source window ([[TextAnalysis.packChunksNaive]], demoted from
  * the query surface because it sorts a whole source in one task).
  * This spec is the equivalence witness; the driver's oracle gate
  * re-proves the same identity against DuckDB's naive SQL every round.
  */
class PackEquivalenceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"t11 salted pack ≡ naive whole-source window pack at $sf") {
      val dir = s"/root/testdata/$sf"
      val salted = graft.SparkEntry.queries("t11_pack_salted")(spark, dir)
      val naive = TextAnalysis.packChunksNaive(spark, dir)
      assert(salted.columns.toSeq === naive.columns.toSeq)
      val s = rows(salted)
      assert(s === rows(naive))
      assert(s.nonEmpty)
    }
  }

  test("p02 per-doc assignments are consistent with the t11 chunk aggregate") {
    val dir = "/root/testdata/sf0.01"
    val p02 = graft.SparkEntry.queries("p02_chunk_assignments")(spark, dir)
    val agg = p02.groupBy("source", "chunk_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum("n_tokens").as("chunk_tokens"),
        org.apache.spark.sql.functions.min("doc_id").as("first_doc"),
        org.apache.spark.sql.functions.max("doc_id").as("last_doc"))
      .orderBy("source", "chunk_id")
    val t11 = graft.SparkEntry.queries("t11_pack_salted")(spark, dir)
    assert(rows(agg) === rows(t11))
  }
}

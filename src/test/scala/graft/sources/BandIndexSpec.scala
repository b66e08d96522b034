package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Text

/** The persisted bucketed band-key index: the band join against it must
  * not shuffle the index side — zero Exchange for the full self-join,
  * exactly one (the small new side) for the incremental shape — and
  * candidate semantics must be identical to the inline band join.
  */
class BandIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def shingleDocs = graft.Tables(spark, dir, "documents")
    .select(col("doc_id"), Text.distinctShingles(col("text")).as("sh"))

  private def reset(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
  }

  private def inlineCandidates(bands: org.apache.spark.sql.DataFrame) =
    bands.as("x").join(bands.as("y"),
        col("x.j") === col("y.j") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct()

  test("index ⋈ index: zero shuffle exchanges in the band-join subtree") {
    reset("bands_idx")
    BandIndex.write(graft.queries.Dedup.bandKeys(shingleDocs), "bands_idx")
    // plan shape: assert on the join WITHOUT the trailing distinct (the
    // distinct legitimately shuffles its own aggregation); the join
    // subtree itself must read both sides in place
    val t = spark.table("bands_idx")
    val joined = t.as("x").hint("merge").join(t.as("y"),
      col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"band self-join against the bucketed index must not shuffle:\n$plan")
    // semantics: identical to the inline (j, bkey) band join
    val fromIndex = BandIndex.candidates(spark, "bands_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = inlineCandidates(graft.queries.Dedup.bandKeys(shingleDocs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIndex === inline)
    assert(fromIndex.nonEmpty)
  }

  test("index ⋈ new batch: only the small new side shuffles") {
    reset("bands_idx2")
    val all = graft.queries.Dedup.bandKeys(shingleDocs)
    // split: history = even doc_ids (indexed), batch = odd doc_ids
    BandIndex.write(all.filter(col("doc_id") % 2 === 0), "bands_idx2")
    val newBands = all.filter(col("doc_id") % 2 === 1)
    val nb = BandIndex.withBand(newBands).select("doc_id", "band")
    val histJoin = spark.table("bands_idx2").as("x").hint("merge").join(nb.as("y"),
      col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
    val plan = histJoin.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"exactly the new side may shuffle (found $exchanges exchanges):\n$plan")
    // semantics: equals (hist ∪ new) ⋈ new on the inline band join
    val expected = all.as("x").join(newBands.as("y"),
        col("x.j") === col("y.j") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = BandIndex.candidatesAgainst(spark, "bands_idx2", newBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("band encoding is injective on the real key space") {
    // distinct (j, bkey) count == distinct band count over the corpus
    val bands = BandIndex.withBand(graft.queries.Dedup.bandKeys(shingleDocs))
    val composite = bands.select("j", "bkey").distinct().count()
    val scalar = bands.select("band").distinct().count()
    assert(composite === scalar)
  }
}

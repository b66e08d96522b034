package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(label + " " + (System.nanoTime()-t0)/1e9); r }
    def run(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), Text.distinctShingles(col("text")).as("sh"))
    // warm everything once
    run(graft.SparkEntry.queries("d02_jaccard_pairs")(spark, "/root/testdata/sf0.1"))
    val ex = docs.select(col("doc_id"), explode(array_distinct(Text.fps(col("sh")))).as("s"))
    val kept0 = ex.join(ex.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= 50).select("s"), "s")
    val kept = t("cp(kept)")(kept0.localCheckpoint())
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pagg = kept.as("a").join(kept.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).agg(count(lit(1)).as("n_common"))
    t("pair join+agg")(run(pagg))
    val full = pagg.join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"), (col("n_common").cast("double") / (col("na") + col("nb") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5).orderBy("a_id", "b_id")
    t("full rest")(run(full))
    t("full query warm")(run(graft.SparkEntry.queries("d02_jaccard_pairs")(spark, "/root/testdata/sf0.1")))
    println("pair agg groups=" + pagg.count())
    spark.stop()
  }
}

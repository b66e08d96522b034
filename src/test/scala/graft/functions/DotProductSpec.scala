package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {

  import spark.implicits._

  test("graft_dot equals the kernel fold, bit-exact") {
    val a = Seq(0.1, -2.5, 3.75, 1e-9)
    val b = Seq(4.0, 0.3, -1.25, 2e9)
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(Vectors.dot(col("a"), col("b"))).head.getDouble(0)
    assert(got === Vectors.dotKernel(a, b))
  }

  test("null inputs and length mismatch") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0))),          // mismatch: fold min length
      (None: Option[Seq[Double]], Some(Seq(1.0))))    // null side → null
      .toDF("a", "b")
    val rows = df.select(Vectors.dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) === 3.0)
    assert(rows(1).isNullAt(0))
  }

  test("dot inlines into whole-stage codegen (no ScalaUDF in plan)") {
    // parquet-backed input: a pure local relation constant-folds away
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(Vectors.toDoubleVec(col("embedding")).as("v"))
    val df = e.select(Vectors.dot(col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_dot")), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("cosine built on graft_dot matches oracle-order computation") {
    val v1 = Seq(1.0, 2.0, 3.0)
    val v2 = Seq(-1.0, 0.5, 2.0)
    val df = Seq((v1, v2)).toDF("a", "b")
    val got = df.select(Vectors.cosine(col("a"), col("b"))).head.getDouble(0)
    val exp = Vectors.dotKernel(v1, v2) /
      (math.sqrt(Vectors.dotKernel(v1, v1)) * math.sqrt(Vectors.dotKernel(v2, v2)))
    assert(got === exp)
  }
}

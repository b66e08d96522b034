package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** v09's quantization kernels: int8 codes of a unit-normalized vector
  * and the exact integer dot over codes (functions/Quantize.scala).
  */
class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  private def refCodes(v: Seq[Double]): Seq[Long] = {
    val nrm = math.sqrt(Vectors.dotKernel(v, v))
    v.map(x => math.floor(x / nrm * 127.0 + 0.5).toLong)
  }

  test("graft_quantize_i8 matches the reference fold, codes within [-127, 127]") {
    val v = Seq(0.5, -0.25, 0.8, 0.0, -0.9, 1e-9)
    val df = Seq(Tuple1(v)).toDF("v")
      .select(col("v"), sqrt(Vectors.dot(col("v"), col("v"))).as("nrm"))
    val got = df.select(Vectors.quantizeI8(col("v"), col("nrm"))).head().getSeq[Long](0)
    assert(got === refCodes(v))
    assert(got.forall(c => c >= -127L && c <= 127L))
  }

  test("round-half-up at the .5 boundary and on negatives") {
    // nrm = 1 so the codes are floor(x·127 + 0.5) directly:
    // 0.5/127 scales to exactly 0.5 → rounds UP to 1; negative mirror
    // floors toward -inf (-0.5 + 0.5 = 0 → 0), matching DuckDB's
    // floor() on the identical doubles
    val v = Seq(0.5 / 127.0, -0.5 / 127.0, 1.0, -1.0)
    val df = Seq(Tuple1(v)).toDF("v").select(col("v"), lit(1.0).as("nrm"))
    val got = df.select(Vectors.quantizeI8(col("v"), col("nrm"))).head().getSeq[Long](0)
    assert(got === Seq(1L, 0L, 127L, -127L))
  }

  test("graft_long_dot is the exact integer fold; null side → null") {
    val a = Seq(127L, -127L, 3L)
    val b = Seq(127L, 127L, -2L)
    val df = Seq((Some(a), Some(b)), (None: Option[Seq[Long]], Some(b)))
      .toDF("a", "b")
    val rows = df.select(Vectors.longDot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getLong(0) === (127L * 127 - 127L * 127 - 6L))
    assert(rows(1).isNullAt(0))
  }

  test("both kernels inline into whole-stage codegen (no ScalaUDF)") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(Vectors.toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val df = e.select(Vectors.quantizeI8(col("v"), col("nrm")).as("qc"))
      .select(Vectors.longDot(col("qc"), col("qc")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_quantize_i8")), plan)
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_long_dot")), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("randomized parity: codegen codes equal the reference fold on adversarial values") {
    // deterministic pseudo-random corpus mixing magnitudes from 1e-6 to
    // 1e3, exact-.5 scaled boundaries, zeros, and sign flips — the
    // codegen path (df.select over many rows) must match the JVM
    // reference bit-for-bit on every row
    val rnd = new scala.util.Random(0xC0DE5)
    val vecs = (0 until 200).map { _ =>
      Seq.tabulate(16) { _ =>
        rnd.nextInt(5) match {
          case 0 => 0.0
          case 1 => (rnd.nextGaussian() * 1e3)
          case 2 => (rnd.nextGaussian() * 1e-6)
          case 3 => (rnd.nextInt(255) - 127) / 127.0 // lands on code integers
          case _ => rnd.nextGaussian()
        }
      }
    }.filter(v => Vectors.dotKernel(v, v) > 0)
    val df = vecs.map(Tuple1(_)).toDF("v")
      .select(col("v"), sqrt(Vectors.dot(col("v"), col("v"))).as("nrm"))
    val got = df.select(Vectors.quantizeI8(col("v"), col("nrm"))).collect()
      .map(_.getSeq[Long](0))
    vecs.zip(got).foreach { case (v, g) => assert(g === refCodes(v), s"vector $v") }
  }

  test("malformed inputs fail loudly instead of scoring as garbage (ADVICE r10)") {
    // a null ELEMENT inside the array (the whole-array-null case stays
    // null via nullSafeEval) must raise, not quantize as 0
    val nullElem = Seq(Tuple1(Seq(Some(0.5), None, Some(0.25))))
      .toDF("v").select(col("v").cast("array<double>").as("v"), lit(1.0).as("nrm"))
    val e1 = intercept[Exception] {
      nullElem.select(Vectors.quantizeI8(col("v"), col("nrm"))).collect()
    }
    assert(e1.toString.contains("null element") || e1.getCause != null)
    // zero/negative norm must raise, not emit saturated Long.MAX codes
    val zeroNrm = Seq(Tuple1(Seq(0.0, 0.0))).toDF("v")
      .select(col("v"), lit(0.0).as("nrm"))
    intercept[Exception] {
      zeroNrm.select(Vectors.quantizeI8(col("v"), col("nrm"))).collect()
    }
    // mismatched code dims must raise on THIS engine too (the oracle's
    // len(a)-indexed fold yields NULL there — silent min-length
    // truncation here was the one cross-engine asymmetry left)
    val mismatch = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    intercept[Exception] {
      mismatch.select(Vectors.longDot(col("a"), col("b"))).collect()
    }
  }

  test("quantized self-dot approximates 127² for unit vectors") {
    // |codes|² ≈ 127²·|v/nrm|² = 16129 with per-dim rounding error
    // ≤ 0.5 ⇒ |Σ err·2·127·x| bounded well under 5% for 64 dims
    val rows = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(Vectors.toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .select(Vectors.quantizeI8(col("v"), col("nrm")).as("qc"))
      .select(Vectors.longDot(col("qc"), col("qc")).as("d"))
      .collect().map(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach(d => assert(math.abs(d - 16129L) <= 800L, s"self-dot $d far from 127^2"))
  }
}

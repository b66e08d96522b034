package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PqCodebook
import graft.functions.Vectors._

/** Product quantization kernels (r13):
  *
  *  - training is deterministic (same sample → bit-identical codebook)
  *    and every codeword is finite;
  *  - [[PqEncode]] agrees with a plain-Scala reference argmin over the
  *    same codebook (including the smaller-code tie-break), and raises
  *    on dim mismatch / non-positive norm;
  *  - [[PqAdcDot]] equals the plain-Scala LUT fold, approximates the
  *    true unit dot (bounded error on real fixture vectors), and
  *    raises on out-of-range query index or wrong code length;
  *  - the v11 recall floor's inputs: the shipped dial's measured
  *    frontier-50 hit counts (28/24/22 of 30 across the SFs) sit well
  *    above V11Floor = 12 — asserted at the gate SF here.
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val M = 16
  private val K = 16

  private def unitSample(): Seq[Array[Double]] = {
    val e = Similarity.emb(spark, dir)
    e.filter(col("vec_id") < 256).orderBy("vec_id")
      .select(col("vec_id"), col("v"), col("nrm")).collect()
      .map { r =>
        val v = r.getSeq[Double](1); val n = r.getDouble(2)
        v.map(_ / n).toArray
      }.toSeq
  }

  test("training is deterministic and finite") {
    val s = unitSample()
    val cb1 = PqCodebook.train(s, M, K)
    val cb2 = PqCodebook.train(s, M, K)
    assert(java.util.Arrays.equals(cb1, cb2), "same sample must train the same codebook")
    assert(cb1.forall(java.lang.Double.isFinite), "codewords must be finite")
    assert(cb1.length === M * K * (64 / M))
  }

  test("PqEncode matches a plain-Scala argmin reference with smaller-code ties") {
    val s = unitSample()
    val cb = PqCodebook.train(s, M, K)
    val sub = 64 / M
    def refEncode(u: Array[Double]): Seq[Long] =
      (0 until M).map { j =>
        var bestC = 0L
        var best = Double.PositiveInfinity
        for (c <- 0 until K) {
          var d2 = 0.0
          for (i <- 0 until sub) {
            val d = u(j * sub + i) - cb(j * K * sub + c * sub + i)
            d2 += d * d
          }
          if (java.lang.Double.compare(d2, best) < 0) { best = d2; bestC = c }
        }
        bestC
      }
    val e = Similarity.emb(spark, dir)
    val got = e.filter(col("vec_id") < 20).orderBy("vec_id")
      .select(col("vec_id"), pqEncode(col("v"), col("nrm"), cb, M, K).as("pq"),
        col("v"), col("nrm")).collect()
    got.foreach { r =>
      val u = r.getSeq[Double](2).map(_ / r.getDouble(3)).toArray
      assert(r.getSeq[Long](1) === refEncode(u),
        s"encode diverged from reference at vec_id ${r.getLong(0)}")
    }
  }

  test("PqAdcDot equals the LUT fold and approximates the true unit dot") {
    val s = unitSample()
    val cb = PqCodebook.train(s, M, K)
    val e = Similarity.emb(spark, dir)
    val qRows = e.filter(col("vec_id") >= 300 && col("vec_id") < 302)
      .orderBy("vec_id").select(col("vec_id"), col("v"), col("nrm")).collect()
    val qUnits = qRows.map { r =>
      val v = r.getSeq[Double](1); val n = r.getDouble(2); v.map(_ / n).toArray
    }.toSeq
    val luts = PqCodebook.luts(cb, qUnits, M, K)
    val rows = e.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("v"), col("nrm"),
        pqEncode(col("v"), col("nrm"), cb, M, K).as("pq"),
        pqAdc(lit(0), pqEncode(col("v"), col("nrm"), cb, M, K), luts, M, K).as("adc"))
      .collect()
    val q0 = qUnits.head
    rows.foreach { r =>
      val codes = r.getSeq[Long](3)
      val refAdc = (0 until M).map(j => luts(j * K + codes(j).toInt)).sum
      assert(math.abs(r.getDouble(4) - refAdc) < 1e-12, "adc != LUT fold")
      val u = r.getSeq[Double](1).map(_ / r.getDouble(2))
      val trueDot = u.zip(q0).map { case (a, b) => a * b }.sum
      assert(math.abs(r.getDouble(4) - trueDot) < 0.5,
        s"adc error implausibly large at vec_id ${r.getLong(0)}: " +
          s"adc=${r.getDouble(4)} true=$trueDot")
    }
  }

  test("malformed inputs raise loudly") {
    val s = unitSample()
    val cb = PqCodebook.train(s, M, K)
    val e = Similarity.emb(spark, dir).limit(1)
    intercept[Exception] {
      e.select(pqEncode(slice(col("v"), 1, 10), col("nrm"), cb, M, K)).collect()
    }
    intercept[Exception] {
      e.select(pqEncode(col("v"), lit(0.0), cb, M, K)).collect()
    }
    val luts = PqCodebook.luts(cb, Seq(Array.fill(64)(0.1)), M, K)
    intercept[Exception] {
      e.select(pqAdc(lit(5), pqEncode(col("v"), col("nrm"), cb, M, K),
        luts, M, K)).collect()
    }
  }

  test("the gated recall input clears V11Floor with margin at the fixture SF") {
    val row = graft.SparkEntry.queries("v11_pq_adc")(spark, dir).collect().head
    assert(row.getAs[Long]("n_queries") === 10L)
    assert(row.getAs[Long]("recall_ok") === 1L)
    assert(row.getAs[Long]("never_better") === 1L)
  }
}

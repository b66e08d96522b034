package graft

/** The round-8 regression class: a query that fails before execution
  * must surface as a counted failure, never as silence (Verify) or a
  * plausible 0-second row (Bench). This spec drives Verify.runAll —
  * the exact code path main uses — against both a good and a
  * deliberately broken fixture dir and asserts the accounting.
  */
class VerifyAccountingSpec extends SparkSpec {

  private val good = "/root/testdata/sf0.001"
  private val pick = Set("q01_pricing_summary", "d01_exact_dedup")

  test("every selected query yields a parquet result or a recorded failure") {
    val out = java.nio.file.Files.createTempDirectory("verify_ok").toString
    val failed = Verify.runAll(spark, good, out, Some(pick))
    assert(failed.isEmpty, s"unexpected failures: $failed")
    pick.foreach { n =>
      assert(new java.io.File(s"$out/$n").isDirectory, s"no result written for $n")
    }
  }

  test("a broken fixture dir fails EVERY query loudly, writing nothing") {
    val out = java.nio.file.Files.createTempDirectory("verify_broken").toString
    val failed = Verify.runAll(spark, "/nonexistent/fixtures", out, Some(pick))
    assert(failed.toSet === pick, s"expected all of $pick to fail, got $failed")
    pick.foreach { n =>
      assert(!new java.io.File(s"$out/$n").exists(), s"partial result written for $n")
    }
  }
}

package graft.sources

import graft.SparkSpec

object ThrottleSpec {
  /** Static transport stub (companion object so Spark closures don't
    * capture the scalatest Engine — see SparkSpec conventions).
    */
  val echo: String => String = u => s"ok:$u"
}

class ThrottleSpec extends SparkSpec {

  import spark.implicits._

  test("mapThrottled paces calls to the per-partition rate") {
    val ds = spark.createDataset(Seq("a", "b", "c", "d", "e")).repartition(1)
    val t0 = System.nanoTime()
    val out = Throttle.mapThrottled(ds, perSecPerPartition = 50.0)(ThrottleSpec.echo)
      .collect().sorted
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out === Array("ok:a", "ok:b", "ok:c", "ok:d", "ok:e"))
    // 5 calls at 50/s: first immediate, 4 spaced by >= 20ms each
    assert(elapsedMs >= 75.0, s"finished in ${elapsedMs}ms — throttle not applied")
  }

  test("perJvmShare splits a cluster budget so the executor-sum equals the quota") {
    // the reference's 1 req/s geocode quota over 100 executors: each
    // JVM gets 0.01/s — 100 buckets × 0.01 = the quota, never 100× it
    assert(Throttle.perJvmShare(1.0, 100) === 0.01)
    assert(Throttle.perJvmShare(60.0, 4) === 15.0)
    assert(Throttle.perJvmShare(1.0, 1) === 1.0)
    intercept[IllegalArgumentException](Throttle.perJvmShare(0.0, 4))
    intercept[IllegalArgumentException](Throttle.perJvmShare(1.0, 0))
    // the share feeds the same acquire() bucket: 3 acquisitions at a
    // 20/s share must space by >= 50ms after the first
    val key = s"spec-bucket-${System.nanoTime()}"
    val t0 = System.nanoTime()
    (1 to 3).foreach(_ => Throttle.acquire(key, Throttle.perJvmShare(80.0, 4)))
    assert((System.nanoTime() - t0) / 1e6 >= 95.0)
  }

  test("an effectively-unthrottled rate adds no meaningful wait") {
    val ds = spark.createDataset((1 to 100).map(_.toString)).repartition(2)
    val t0 = System.nanoTime()
    val n = Throttle.mapThrottled(ds, perSecPerPartition = 1e6)(ThrottleSpec.echo).count()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(n === 100)
    assert(elapsedMs < 5000.0)
  }
}

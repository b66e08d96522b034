package graft.sources

import org.apache.spark.sql.{Dataset, Encoder}

/** Rate-limited distributed fetch — the Spark shape of the reference's
  * throttled per-row HTTP loops (`weather_data_fetcher.py:132-143`
  * geocode lookup, `:260-263` weather fetch: one request per row with an
  * inter-call sleep).
  *
  * `mapPartitions` keeps ONE limiter (and, in a real deployment, one
  * connection/session) per partition; rows stream through lazily, so a
  * partition never buffers more than one in-flight element. The global
  * request rate is `perSecPerPartition × numPartitions` — size the
  * partition count to the provider's quota (`df.repartition(quota /
  * perSecPerPartition)`), which is also how the work spreads across a
  * 1000-executor cluster without any coordinator.
  *
  * The transport `f` is injected (same seam as
  * [[JsonSource.fromPayload]] and the geocoder in
  * [[graft.weather.GeocodeMatcher]]): the engine stays sandbox-testable
  * and deployment supplies the real HTTP client.
  */
object Throttle {

  /** Map `f` over `ds` with at most `perSecPerPartition` calls per
    * second per partition (token-bucket: the first call in an idle
    * window is immediate; sustained calls space by `1/rate`).
    */
  def mapThrottled[I, O: Encoder](ds: Dataset[I], perSecPerPartition: Double)(
      f: I => O): Dataset[O] = {
    require(perSecPerPartition > 0, "rate must be positive")
    val intervalNs = (1e9 / perSecPerPartition).toLong
    ds.mapPartitions { it =>
      var nextAllowed = 0L // ns timestamp the next call may start at
      it.map { i =>
        val now = System.nanoTime()
        if (now < nextAllowed) {
          val waitNs = nextAllowed - now
          Thread.sleep(waitNs / 1000000L, (waitNs % 1000000L).toInt)
        }
        nextAllowed = math.max(now, nextAllowed) + intervalNs
        f(i)
      }
    }
  }
}

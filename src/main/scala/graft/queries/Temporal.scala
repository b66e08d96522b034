package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators Spark lacks as primitives, composed from
  * existing ops per the preference order (compose > custom plan):
  *
  *  - As-of join (w01): NOT a range join + rank — that explodes pairs.
  *    Both sides union into one stream tagged by kind, one window per
  *    entity carries the last build-side value forward, probe rows read
  *    it. One shuffle + sort per entity key, zero pair blow-up — the
  *    shape that survives 100 TB (equivalently: the streaming
  *    mapGroupsWithState formulation, see streaming/EventStreams).
  *  - Range-window aggregate (w02): value-based RANGE frame over
  *    event-time micros — "events in the trailing 10 minutes" without a
  *    self-join.
  *
  * Oracles: DuckDB's native ASOF LEFT JOIN / RANGE frames compute the
  * same semantics through a completely different implementation — a
  * strong cross-engine check that the composition is right.
  */
object Temporal {

  /** w01's union+carry core: every click row with the carried most
    * recent at-or-before purchase (`p_event_id`, `p_ts` — null when no
    * prior purchase exists). Shared by w01 (plain as-of) and w05
    * (tolerance as-of: the nearest at-or-before match IS the carried
    * one, so a max-gap as-of is exactly this relation with out-of-
    * tolerance matches nulled — no second pass, no pair join).
    */
  private def asofBackwardCore(ev: DataFrame): DataFrame = {
    // dedup purchases per (user, ts) so the as-of pick is deterministic
    val pd = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("p_event_id"))
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("p_event_id"), lit(null).cast("long").as("c_event_id"))
    val ck = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast("long").as("p_event_id"), col("event_id").as("c_event_id"))
    // order (ts, kind): a purchase at the same instant sorts before the
    // click, so ">= inclusive" as-of semantics hold
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pd.unionByName(ck)
      .withColumn("p_id", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("p_ts", last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("c_event_id").as("event_id"), col("user_id"), col("ts"),
        col("p_id").as("p_event_id"), col("p_ts"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // each click gets the user's most recent at-or-before purchase
    "w01_asof_click_purchase" -> ((s, dir) =>
      asofBackwardCore(Tables(s, dir, "events")).orderBy("event_id")),

    // TOLERANCE as-of — the third standard variant (pandas merge_asof's
    // `tolerance`, feature-store point-in-time joins with a staleness
    // cap): the backward match counts only within a trailing 24-hour
    // gap; staler matches null out but the click row survives (left
    // semantics). Since the nearest at-or-before match is the carried
    // one, out-of-tolerance ⇒ NO valid match exists — same one-shuffle
    // carry, a map-side predicate, zero extra cost at any scale.
    "w05_asof_tolerance" -> ((s, dir) => {
      val tolUs = 24L * 3600L * 1000000L
      val ok = col("p_ts").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("p_ts")) <= tolUs
      asofBackwardCore(Tables(s, dir, "events"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(ok, col("p_event_id")).as("p_event_id"),
          when(ok, col("p_ts")).as("p_ts"))
        .orderBy("event_id")
    }),

    // the FORWARD as-of: each click gets the user's NEXT purchase
    // at-or-after (conversion attribution). Same union+carry shape as
    // w01, mirrored — the frame looks forward and first() replaces
    // last(); kinds flip so a same-instant purchase is visible to the
    // click's forward frame (inclusive "<=" semantics)
    "w04_asof_forward" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val pd = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("p_event_id"))
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("p_event_id"), lit(null).cast("long").as("c_event_id"))
      val ck = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
          lit(null).cast("long").as("p_event_id"), col("event_id").as("c_event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("kind"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      pd.unionByName(ck)
        .withColumn("p_id", first(col("p_event_id"), ignoreNulls = true).over(w))
        .withColumn("p_ts", first(when(col("kind") === 1, col("ts")), ignoreNulls = true).over(w))
        .filter(col("kind") === 0)
        .select(col("c_event_id").as("event_id"), col("user_id"), col("ts"),
          col("p_id").as("p_event_id"), col("p_ts"))
        .orderBy("event_id")
    }),

    // interval join: purchases × same-user clicks in the trailing hour —
    // the SAME function as the streaming stream-stream join (watermarks
    // no-op on batch); fan-out bounded by (user, interval)
    "w03_interval_join" -> ((s, dir) => {
      graft.streaming.EventStreams.clickToPurchase(Tables(s, dir, "events"))
        .orderBy("user_id", "purchase_id", "click_id")
    }),

    // trailing-10-minute per-user activity, strictly before each event
    "w02_trailing_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tkey"))
        .rangeBetween(-600000000L, -1L) // micros: [ts-10min, ts)
      Tables(s, dir, "events")
        .withColumn("tkey", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_prev_10min"),
          // exact decimal window sum, DOUBLE on output in both engines —
          // decimal columns can't survive the driver's pandas-vs-duckdb
          // compare at any width (see Relational.out2)
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("sum_prev_value"))
        .orderBy("event_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "w01_asof_click_purchase" ->
      """WITH pd AS (SELECT user_id, ts, max(event_id) AS p_event_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |ck AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts, p.p_event_id, p.ts AS p_ts
        |FROM ck c ASOF LEFT JOIN pd p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    // native ASOF again, with the tolerance as a post-join CASE — the
    // nearest at-or-before match either satisfies the gap or no match
    // does, so null-out ≡ tolerance semantics in both engines
    "w05_asof_tolerance" ->
      """WITH pd AS (SELECT user_id, ts, max(event_id) AS p_event_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |ck AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts,
        |  CASE WHEN p.ts >= c.ts - INTERVAL 24 HOUR THEN p.p_event_id END AS p_event_id,
        |  CASE WHEN p.ts >= c.ts - INTERVAL 24 HOUR THEN p.ts END AS p_ts
        |FROM ck c ASOF LEFT JOIN pd p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    // DuckDB's ASOF direction comes from the inequality: "<=" picks the
    // smallest p.ts at-or-after each click
    "w04_asof_forward" ->
      """WITH pd AS (SELECT user_id, ts, max(event_id) AS p_event_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |ck AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts, p.p_event_id, p.ts AS p_ts
        |FROM ck c ASOF LEFT JOIN pd p ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "w03_interval_join" ->
      """WITH c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user_id, ts AS purchase_ts, event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, purchase_id, click_id, purchase_ts, click_ts
        |FROM c JOIN p ON c.user_id = p.p_user_id
        |  AND click_ts <= purchase_ts
        |  AND click_ts >= purchase_ts - INTERVAL 60 MINUTE
        |ORDER BY c.user_id, purchase_id, click_id""".stripMargin,

    "w02_trailing_window" ->
      """SELECT event_id, user_id, ts,
        | count(*) OVER w AS n_prev_10min,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_prev_value
        |FROM (SELECT *, epoch_us(ts) AS tkey FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tkey
        |  RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin
  )
}

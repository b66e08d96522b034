package graft.queries

import graft.SparkSpec

/** q11's anti-join at the gate SFs returns 0 rows (every synthetic
  * customer has orders), so the row-PRODUCING path was evidenced only
  * by plan shape. This fixture has customers that genuinely lack
  * orders and pins that the gated query emits exactly them (r12,
  * round-11 verdict "what's wrong" #3).
  */
class Q11AntiJoinSpec extends SparkSpec {

  import spark.implicits._

  test("customers without orders actually surface (nonzero-row anti-join)") {
    val dir = java.nio.file.Files.createTempDirectory("q11fix").toString
    Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0), (4L, "dave", 40.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    Seq((101L, 1L), (102L, 1L), (103L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    val got = graft.SparkEntry.queries("q11_customers_without_orders")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((2L, "bob", 20.0), (4L, "dave", 40.0)))
  }
}

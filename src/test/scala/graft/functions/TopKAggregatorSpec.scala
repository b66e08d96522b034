package graft.functions

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {

  import spark.implicits._

  test("keeps the k best by (score desc, id asc), dataset-wide") {
    val data = Seq(
      (1L, ScoredNeighbor(10, 0.9)), (1L, ScoredNeighbor(11, 0.7)),
      (1L, ScoredNeighbor(12, 0.95)), (1L, ScoredNeighbor(13, 0.1)),
      (2L, ScoredNeighbor(20, 0.5)))
    val out = data.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(2).toColumn)
      .collect().toMap
    assert(out(1L).map(_.neighbor_id) === Seq(12L, 10L))
    assert(out(2L).map(_.neighbor_id) === Seq(20L))
  }

  test("score ties break by ascending id (window-formulation parity)") {
    val data = (1 to 6).map(i => (1L, ScoredNeighbor(100 - i, 0.5)))
    val out = data.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(3).toColumn)
      .collect().toMap
    assert(out(1L).map(_.neighbor_id) === Seq(94L, 95L, 96L))
  }

  test("merge across many partitions equals single-partition result") {
    val rows = (1 to 500).map(i => (1L, ScoredNeighbor(i.toLong, (i * 37 % 101) / 100.0)))
    def topk(parts: Int) =
      spark.createDataset(rows).repartition(parts).groupByKey(_._1).mapValues(_._2)
        .agg(new TopKAggregator(5).toColumn).collect().toMap.apply(1L)
    assert(topk(1) === topk(13))
  }
}

package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The trained super layer's structural invariants (ADVICE r13): a
  * trained super is a synthetic mean and — unlike a seed super, which
  * always owns at least itself — can end up with ZERO fine-centroid
  * members. twoLevelCore inner-joins probes to shards on s_id, so a
  * memberless super would make vectors routed only to it silently
  * vanish at w < nSup. trainSupers therefore drops memberless supers
  * after the final iteration (argmax-neutral: a memberless super was
  * no centroid's nearest, so every surviving assignment is unchanged)
  * and renumbers densely.
  */
class TrainSupersSpec extends AnyFunSuite {

  /** deterministic synthetic unit vectors (no Random: reproducible). */
  private def vec(seed: Int, dim: Int): (Seq[Double], Double) = {
    val raw = Seq.tabulate(dim)(i => math.sin(seed * 31 + i * 7 + 1.0))
    val n = math.sqrt(raw.map(x => x * x).sum)
    (raw, n)
  }

  private def book(n: Int, dim: Int = 8): Seq[(Long, Seq[Double], Double)] =
    (0 until n).map { i => val (v, nn) = vec(i, dim); (i.toLong, v, nn) }

  private def membership(b: Seq[(Long, Seq[Double], Double)],
      sup: Seq[(Long, Seq[Double], Double)]): Map[Long, Int] =
    b.groupBy { case (_, cv, cn) =>
      // the same argmax rule trainSupers/shardRowsOf use: total-order
      // compare, strictly-greater wins, first-in-order keeps ties
      sup.maxBy { case (_, sv, sn) =>
        var acc = 0.0
        var i = 0
        while (i < cv.length) { acc += cv(i) * sv(i); i += 1 }
        acc / (cn * sn)
      }._1
    }.map { case (sid, cs) => sid -> cs.size }

  test("every trained super owns at least one fine centroid, ids dense") {
    for (n <- Seq(9, 25, 64, 100); nSup <- Seq(2, 3, 8)) {
      val b = book(n)
      val sup = Similarity.trainSupers(b, nSup)
      assert(sup.nonEmpty && sup.size <= nSup)
      assert(sup.map(_._1) === sup.indices.map(_.toLong),
        s"n=$n nSup=$nSup: super ids not dense 0..${sup.size - 1}")
      val m = membership(b, sup)
      sup.foreach { case (sid, _, _) =>
        assert(m.getOrElse(sid, 0) > 0,
          s"n=$n nSup=$nSup: trained super $sid owns zero fine centroids")
      }
      // completeness: every fine centroid lands in exactly one shard
      assert(m.values.sum === n)
    }
  }

  test("degenerate one-super codebook keeps a single owning super") {
    val b = book(5)
    val sup = Similarity.trainSupers(b, 1)
    assert(sup.size === 1)
    assert(membership(b, sup).values.sum === 5)
  }
}

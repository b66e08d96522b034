package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** JVM-level properties of the PassJoin segment blocking — in
  * particular the losslessness (pigeonhole) guarantee d08 relies on.
  */
class SegmentsSpec extends AnyFunSuite {

  private def ed(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("segments partition the string: concatenation restores it, tau+1 pieces") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100; tau <- 1 to 5) {
      val s = Iterator.fill(rnd.nextInt(50))(('a' + rnd.nextInt(4)).toChar).mkString
      val segs = Segments.segmentsOf(s, tau)
      assert(segs.length === tau + 1)
      assert(segs.map(_._2).mkString === s)
      assert(segs.map(_._1).toSeq === (0 to tau))
    }
  }

  test("probe substrings are genuine substrings with bounded count") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50; tau <- Seq(2, 5)) {
      val s = Iterator.fill(10 + rnd.nextInt(40))(('a' + rnd.nextInt(4)).toChar).mkString
      val probes = Segments.probesOf(s, tau)
      assert(probes.length <= (tau + 1) * (tau + 1) * (2 * tau + 1))
      probes.foreach { case (lr, i, sub) =>
        assert(lr >= s.length - tau && lr <= s.length)
        assert(i >= 0 && i <= tau)
        assert(s.contains(sub))
      }
    }
  }

  test("losslessness: every pair within ed <= tau is a blocked candidate") {
    // generate b from a by <= tau random edits over a SMALL alphabet
    // (small alphabets maximize collision/misalignment edge cases),
    // then assert a segment of the shorter occurs among the probes of
    // the longer with matching (shorter-length, segment-index) key —
    // exactly d08's join condition.
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 500) {
      val tau = 1 + rnd.nextInt(5)
      val a = Iterator.fill(6 + rnd.nextInt(40))(('a' + rnd.nextInt(3)).toChar).mkString
      var b = a
      for (_ <- 1 to rnd.nextInt(tau + 1)) {
        val op = rnd.nextInt(3)
        val pos = rnd.nextInt(b.length + (if (op == 1) 1 else 0))
        b = op match {
          case 0 if b.nonEmpty => b.updated(pos, ('a' + rnd.nextInt(3)).toChar) // substitute
          case 1 => b.substring(0, pos) + ('a' + rnd.nextInt(3)).toChar + b.substring(pos) // insert
          case _ if b.nonEmpty => b.substring(0, pos) + b.substring(math.min(pos + 1, b.length)) // delete
          case _ => b
        }
      }
      if (ed(a, b) <= tau) {
        val (r, s) = if (a.length <= b.length) (a, b) else (b, a)
        val segs = Segments.segmentsOf(r, tau).map { case (i, t) => (r.length, i, t) }.toSet
        val probes = Segments.probesOf(s, tau).toSet
        assert(segs.exists(probes.contains),
          s"trial $trial: no blocked candidate for ed=${ed(a, b)} <= tau=$tau: '$a' vs '$b'")
      }
    }
  }
}

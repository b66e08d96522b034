package graft.weather

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants (SURVEY.md §5 item 2): diff is a symmetric
  * difference, id assignment is dense 1..n, normalization is idempotent.
  * Uses raw ScalaCheck Gen with fixed seeds (the scalatest bridge
  * artifact is not in the offline cache; deterministic seeds are better
  * for a reproducible gate anyway).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val nameGen: Gen[String] = for {
    prefix <- Gen.oneOf("", "City of ", "Municipality of ", "Barangay ", "Town of ")
    base <- Gen.alphaStr.map(_.take(12)).suchThat(_.nonEmpty)
    suffix <- Gen.oneOf("", " City")
  } yield prefix + base + suffix

  test("normalizeCityName is idempotent") {
    for (n <- samples(nameGen, 200)) {
      val once = Names.normalizeCityName(n)
      assert(Names.normalizeCityName(once) === once, s"input: '$n'")
    }
  }

  test("nameVariants are distinct and start with the normalized name") {
    for (n <- samples(nameGen, 200)) {
      val vs = Names.nameVariants(n)
      assert(vs.distinct === vs)
      assert(vs.head === Names.normalizeCityName(n))
      assert(vs.contains(n))
    }
  }

  private val rowsGen: Gen[List[(String, Option[String])]] =
    Gen.listOfN(8, for {
      code <- Gen.choose(1, 5).map(i => s"c$i")
      old <- Gen.option(Gen.oneOf("x", "y"))
    } yield (code, old))

  test("symmetricDiff(a, a) = empty; diff rows ⊆ a ∪ b (multiset)") {
    import spark.implicits._
    val cols = Seq("code", "oldName")
    val pairs = samples(rowsGen, 5).zip(samples(rowsGen, 5).reverse)
    for ((a, b) <- pairs) {
      val da = a.toDF("code", "oldName")
      val db = b.toDF("code", "oldName")
      assert(LocationDiff.symmetricDiff(da, da, cols).isEmpty)
      val d = LocationDiff.symmetricDiff(da, db, cols).drop("side")
        .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
      val pool = (a ++ b).groupBy(identity).view.mapValues(_.size).toMap
      val got = d.groupBy(identity).view.mapValues(_.size).toMap
      got.foreach { case (row, n) =>
        assert(pool.getOrElse(row, 0) >= n, s"diff row $row not from inputs")
      }
    }
  }

  test("overwriteSnapshot assigns dense 1..n ids") {
    import spark.implicits._
    for (names <- samples(Gen.listOfN(7, Gen.alphaStr.map(_.take(6)).suchThat(_.nonEmpty)), 3)) {
      val path = java.nio.file.Files.createTempDirectory("ids").resolve("t").toString
      graft.sources.TableStore.overwriteSnapshot(names.toDF("name"), path, "id", Seq("name"))
      val ids = spark.read.parquet(path).select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === (1L to names.length).toSeq)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared-artifact tier's contract (r14): OFF by default —
  * standalone queries rebuild every time (self-containment) — and
  * once-per-(kind, dir) when a suite runner enables sharing, with
  * distinct keys isolated. Uses a private flag reset via reflection-free
  * rebuild counting on unique keys so the JVM-wide `enable()` state
  * (set by other suites' runners) cannot flap the assertions.
  */
class SharedProjectionsSpec extends AnyFunSuite {

  test("reuseArtifact builds once per (kind, dir) when enabled, isolates keys") {
    SharedProjections.enable()
    try {
      var builds = 0
      def build(): String = { builds += 1; s"artifact-$builds" }
      val k = s"spec-${System.nanoTime()}" // unique kind: immune to prior state
      val a1 = SharedProjections.reuseArtifact(k, "dirA")(build())
      val a2 = SharedProjections.reuseArtifact(k, "dirA")(build())
      assert(a1 === a2, "second consumer must read the first build")
      assert(builds === 1, "enabled sharing must build once per key")
      val b1 = SharedProjections.reuseArtifact(k, "dirB")(build())
      assert(b1 !== a1, "different dirs must not share an artifact")
      assert(builds === 2)
    } finally SharedProjections.disable() // later suites run standalone-mode
  }

  test("reuseArtifact rebuilds every time when sharing is off") {
    SharedProjections.disable()
    var builds = 0
    val k = s"spec-off-${System.nanoTime()}"
    SharedProjections.reuseArtifact(k, "dirA") { builds += 1 }
    SharedProjections.reuseArtifact(k, "dirA") { builds += 1 }
    assert(builds === 2, "disabled sharing must rebuild per call")
  }
}

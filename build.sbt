ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtimeweatherdatapipelineforphilippinecitiesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses graft.Bench's stdout: it keeps only the LAST ~2000
// chars and needs the JSON line bare. Pass forked output through without
// sbt's "[info] " prefix, and drop the trailing "[success] Total time"
// line so the JSON line is the last thing on stdout.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Fork heap = min(48g, ~40% of host RAM), SPARK_DRIVER_MEM overrides.
  // The whole-suite runners hold the shared silver projection, sketch
  // checkpoints, and the widest join's execution memory in ONE
  // local-mode JVM — at 8g the 100x suite thrashed storage against
  // execution (v08 read 73 s in-suite vs 31 s in an empty heap), so on
  // the 125 GiB driver box this resolves to 48g. Capping at 40% of
  // MemTotal (ADVICE r11) keeps smaller contributor machines out of
  // the OOM killer: every sbt fork inherits this -Xmx.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val memTotalGb = try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .find(_.startsWith("MemTotal"))
        .map(_.filter(_.isDigit).toLong / (1024 * 1024)).getOrElse(0L)
    } catch { case _: Throwable => 0L }
    val gb = if (memTotalGb <= 0) 8L else math.max(4L, math.min(48L, memTotalGb * 2 / 5))
    s"${gb}g"
  })}",
)
scalacOptions += "-deprecation"

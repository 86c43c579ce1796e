ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbcinformedsocketcantoparquetspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// Parallel test execution: 65+ suites in ONE forked JVM run ~12.5 min
// wall; each suite's SparkSession is local[4], so on a 32-core host most
// of the machine idles. Deterministic round-robin over name-sorted
// suites into GRAFT_TEST_GROUPS forked JVMs (default 6 → 6 × local[4] =
// 24 Spark threads, 6 × 8g heap worst case), run concurrently. Suites
// share nothing across JVMs: no fixed ports (ServerSocket(0)
// everywhere), no fixed tmp paths (createTemp*), no warehouse writes —
// verified by grep before this was turned on. GRAFT_TEST_GROUPS=1
// restores the single-JVM order for debugging.
val testGroupCount = {
  val raw = sys.env.getOrElse("GRAFT_TEST_GROUPS", "6")
  scala.util.Try(raw.toInt).toOption.filter(_ >= 1).getOrElse(
    sys.error(s"GRAFT_TEST_GROUPS must be a positive integer, got '$raw'"))
}
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / javaOptions).value.toVector
  val base = baseDirectory.value
  tests.zipWithIndex.groupBy(_._2 % testGroupCount).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"g$i", ts.map(_._1),
        Tests.SubProcess(ForkOptions()
          .withRunJVMOptions(opts)
          .withWorkingDirectory(base)))
    }
}
// REPLACE the default restrictions: sbt ships Tags.limit(ForkedTestGroup, 1)
// and with multiple limits on one tag the most restrictive wins — appending
// a higher limit is a no-op (observed: groups ran sequentially).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(testGroupCount + 2),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
)

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "queryenginespark"
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
// pass forked-run output straight through: the driver parses Bench's
// one-line JSON from stdout, and sbt's default logger would prefix it
// with "[info] "
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// 65+ catalog queries × 3 executions in one JVM: an undersized heap
// turns the bench into a GC benchmark (r01 measured 2-4× inflation) —
// but a fixed 28g default fails JVM startup outright on smaller hosts,
// so derive the default from physical memory (~70%, capped at 28g)
// and let SPARK_DRIVER_MEM override either way.
val forkedHeap: String = sys.env.getOrElse(
  "SPARK_DRIVER_MEM", {
    val physGb =
      try {
        val src = scala.io.Source.fromFile("/proc/meminfo")
        try src.getLines()
          .collectFirst { case l if l.startsWith("MemTotal:") => l.split("\\s+")(1).toLong }
          .map(_ / 1024 / 1024)
          .getOrElse {
            System.err.println("[build] MemTotal not found in /proc/meminfo; assuming 8 GB — set SPARK_DRIVER_MEM to override")
            8L
          }
        finally src.close()
      } catch {
        case e: Throwable =>
          System.err.println(s"[build] could not read /proc/meminfo (${e.getMessage}); assuming 8 GB — set SPARK_DRIVER_MEM to override")
          8L
      }
    s"${math.max(2L, math.min(28L, physGb * 7 / 10))}g"
  })
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkedHeap",
)
// experiment hook: extra JVM flags for the forked run/test JVMs
// (e.g. SPARK_GRAFT_EXTRA_JVM="-XX:ReservedCodeCacheSize=1g") —
// lets A/B runs vary JVM sizing without editing the build
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM")
  .map(_.split("\\s+").filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)

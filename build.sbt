ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "openstackbillingfromdbspark"
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
// Inherit the forked process's stdio directly: Bench's one-line JSON
// metric must reach stdout WITHOUT sbt's "[info] " logger prefix, or the
// driver's parse of BENCH_r{N}.json records "parsed": null (round 1 did).
run / outputStrategy := Some(StdoutOutput)
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
  // 16g default: local[32] benches showed multi-second one-sided GC
  // spikes at 8g (the host has 128 GiB; leave headroom for the oracle)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++
  // measurement-only escape hatch (r16: the setjoin in-suite-inflation
  // root-cause pass needed GC logs): space-separated extra JVM flags,
  // e.g. SPARK_GRAFT_JAVA_OPTS="-Xlog:gc". Unset (the driver's path)
  // this adds nothing.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS")
    .map(_.split(" ").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)

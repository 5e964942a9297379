ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlgeonetquakesspark"
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
  // The container's locale is C/ASCII, and Spark's VARIANT builder
  // (parse_json) converts through the JVM default charset — under
  // ASCII every non-ASCII byte becomes U+FFFD (found by q212's
  // hazard-escape gate; from_json/get_json_object are explicit-UTF-8
  // and immune). A data engine must not depend on ambient locale:
  // pin UTF-8 like spark-submit environments do. Everything
  // hash-gated elsewhere uses explicit charsets, so this changes
  // nothing else (full 204-oracle sweep re-run green after the flip).
  "-Dfile.encoding=UTF-8",
)

// surface deprecation sites in CI output (4 known, all benign JDK/Scala
// stdlib deprecations — kept visible so new ones stand out)
scalacOptions += "-deprecation"

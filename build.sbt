ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "planspark"
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
  // local[32] on the 128 GiB box: 8g starved 32 concurrent hash-agg tasks
  // into spill storms at >10M-group cardinalities (q18 at the 50× bench
  // scale); 48g leaves headroom for sbt + the DuckDB oracle process.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)

// ---------------- parallel forked test groups ----------------
// One sequential forked JVM on local[4] walls `sbt test` at 52:41 (r9
// measurement, 804 tests) — past the driver's gate budget (round-8 shipped
// tests_ok:false on exactly this). Suites are grouped by LPT over measured
// per-suite walls into parallel forked JVMs; each group JVM runs its suites
// sequentially against its own SparkContext, so no suite shares session
// state across groups. Tests are toy-scale (sf0.001/sf0.01): a JVM needs
// nowhere near the bench heap, so cap test JVMs lower (last -Xmx wins).
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "8g")}"
// Measured suite walls (seconds, r9 `sbt test` with -oD); unknown → 10.
// Only used for load balancing — wrong weights cost wall, never results.
val suiteWeights: Map[String, Int] = Map(
  "QuerySmokeSpec" -> 140, "QuerySmokeSpecB" -> 140, "QuerySmokeSpecC" -> 140,
  "QuerySmokeSpecD" -> 140, "QuerySmokeSpecE" -> 140, "QuerySmokeSpecF" -> 140,
  "VectorIndexSpec" -> 114, "MaterializedViewSpec" -> 111,
  "FtsIndexSpec" -> 76, "DedupSpec" -> 74, "EventStreamSpec" -> 51,
  "ConflictSpec" -> 49, "OrderIndependenceSpec" -> 49, "LakeDatasetSpec" -> 48,
  "ChangeFeedSpec" -> 48, "BranchSpec" -> 41, "LakeSinkSpec" -> 41,
  "MorDmlSpec" -> 36, "DistributedPruneFuzzSpec" -> 31, "PlanSpec" -> 28,
  "TextOpsSpec" -> 28, "LakeCatalogSpec" -> 26, "RefTpchFullSpec" -> 26,
  "ConditionalPutLakeSpec" -> 26, "LakeStreamSourceSpec" -> 26,
  "PsqlSpec" -> 25, "MvJoinRewriteSpec" -> 25, "DeletionVectorSpec" -> 23,
  "BloomIndexSpec" -> 22, "ManifestChunkSpec" -> 21,
  "MultiProcessCompactionSpec" -> 21, "PrimaryKeySpec" -> 19,
  "SchemaEvolutionSpec" -> 19, "SecondaryIndexSpec" -> 18,
  "WireServerSpec" -> 17, "ZOrderSpec" -> 16, "RowLevelOpsSpec" -> 16,
  "HadoopFsLakeSpec" -> 16, "GraftFsLakeSpec" -> 15, "ChunkedRewriteSpec" -> 14,
  "MvRewriteSpec" -> 14, "ClusterSpec" -> 13, "TpcdsSpec" -> 12,
  "BucketingSpec" -> 11, "SpatialIndexSpec" -> 10, "FooterStatsSpec" -> 10,
)
val testGroupCount = 8
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val base = baseDirectory.value
  def weight(name: String): Int = {
    val simple = name.substring(name.lastIndexOf('.') + 1)
    suiteWeights.getOrElse(simple, 10)
  }
  val groups =
    Array.fill(testGroupCount)(Vector.newBuilder[sbt.TestDefinition])
  val loads = Array.fill(testGroupCount)(0L)
  tests.sortBy(t => (-weight(t.name), t.name)).foreach { t =>
    val i = loads.indexOf(loads.min)
    groups(i) += t
    loads(i) += weight(t.name)
  }
  groups.toSeq.zipWithIndex.flatMap { case (g, i) =>
    val defs = g.result()
    if (defs.isEmpty) None
    else Some(Tests.Group(s"g$i", defs, Tests.SubProcess(
      ForkOptions()
        .withWorkingDirectory(Some(base))
        .withRunJVMOptions(opts))))
  }
}
// sbt's DEFAULT restrictions include Tags.limit(ForkedTestGroup, 1) and
// limits compose as the minimum, so appending a higher limit is a no-op —
// the default set must be REPLACED for groups to actually run in parallel.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(32),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))

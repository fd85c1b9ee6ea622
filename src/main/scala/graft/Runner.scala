package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Non-interactive SQL runner — the counterpart of the reference's `tester`
  * binary (cmd/tester/main.go:42-113: run a query file against loaded
  * tables, write results). Usage:
  *
  * {{{
  *   runMain graft.Runner <sfDir> <file.sql> [more.sql ...] [--out <dir>]
  * }}}
  *
  * Each file may hold multiple `;`-separated statements; the last statement's
  * result is shown (and written as parquet under --out/<basename>). */
object Runner {
  def main(args: Array[String]): Unit = {
    val (outDir, files0) = args.toSeq.drop(1) match {
      case rest if rest.contains("--out") =>
        val i = rest.indexOf("--out")
        (Some(rest(i + 1)), rest.patch(i, Nil, 2))
      case rest => (None, rest)
    }
    val sfDir = args(0)
    require(files0.nonEmpty, "usage: Runner <sfDir> <file.sql>... [--out dir]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // see Bench: keep scans parallel over compact file layouts
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    graft.functions.GraftFunctions.register(spark)
    files0.foreach { f =>
      val stmts = Files.readString(Paths.get(f))
        .split(";").map(_.trim).filter(_.nonEmpty)
      val results = stmts.map(graft.ddl.SqlBridge.execute(spark, _))
      val last = results.last
      println(s"== $f ==")
      last.show(50, truncate = false)
      outDir.foreach { d =>
        val base = Paths.get(f).getFileName.toString.stripSuffix(".sql")
        last.coalesce(1).write.mode("overwrite").parquet(s"$d/$base")
      }
    }
    spark.stop()
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // hot key 1 (1000 rows), cold keys 2..50
    val left = ((1 to 1000).map(i => (1L, s"h$i")) ++
      (2 to 50).map(k => (k.toLong, s"c$k"))).toDF("k", "lv")
    val right = (1 to 50).map(k => (k.toLong, k * 10)).toDF("k", "rv")
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", factor = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 1049)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    val df = ((1 to 500).map(_ => (1L, 1.0)) ++
      (2 to 20).map(k => (k.toLong, k * 0.5))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, "k", salt = 8)(
      phase1 = Seq("s" -> sum(col("v")), "n" -> count(lit(1))),
      phase2 = Seq("s" -> sum(col("s")), "n" -> sum(col("n"))))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}

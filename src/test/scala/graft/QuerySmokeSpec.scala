package graft

/** Every registry query runs end-to-end on sf0.001 and yields a sane,
  * non-empty result. Exact value checks are the driver's DuckDB gate;
  * this suite catches runtime regressions (unresolved columns, bad casts)
  * in-repo before the driver ever runs.
  *
  * Sharded: the single suite measured 817 s of the 52:41 r9 test wall —
  * by far the longest suite, and the floor on any parallel-group wall.
  * Six shard classes (deterministic registry-index modulo) let build.sbt's
  * LPT test grouping spread the smoke across forked JVMs. Every query is
  * still covered exactly once (pinned by the shard-0 coverage test). */
abstract class QuerySmokeShard(shard: Int, of: Int) extends SparkTestBase {

  private val expectedRows: Map[String, Int] = Map(
    "q1_agg" -> 6,
    "q3_join_topn" -> 10,
    "q5_join6" -> 1, // only one ASIA nation has 1997 revenue at sf0.001
    "q6_filter" -> 1,
    "q10_returns_topn" -> 20)

  /** Queries whose correct sf0.001 result may be empty (tiny-SF artifacts);
    * still must run without error. */
  private val emptyOk =
    Set("rel_not_in_subq", "rel_except", "q17_corr_scalar", "q7_nation_pairs",
      "q20_nested_semi")

  QuerySmokeShard.shardOf(shard, of).foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val n = q.run(spark, sf0001).count()
      expectedRows.get(q.name) match {
        case Some(exp) => assert(n == exp, s"${q.name}: $n rows, expected $exp")
        case None if emptyOk(q.name) => assert(n >= 0)
        case None => assert(n > 0, s"${q.name}: empty result")
      }
    }
  }
}

object QuerySmokeShard {
  val Shards = 6
  def shardOf(shard: Int, of: Int): Seq[Q] =
    SparkEntry.registry.zipWithIndex.collect {
      case (q, i) if i % of == shard => q
    }
}

class QuerySmokeSpec extends QuerySmokeShard(0, QuerySmokeShard.Shards) {

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique (duplicates would silently drop queries)") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry names: $dups")
    assert(SparkEntry.queries.size == names.size)
  }

  test("shards cover the whole registry exactly once") {
    val all = (0 until QuerySmokeShard.Shards)
      .flatMap(s => QuerySmokeShard.shardOf(s, QuerySmokeShard.Shards))
      .map(_.name)
    assert(all.sorted == SparkEntry.registry.map(_.name).sorted)
  }
}

class QuerySmokeSpecB extends QuerySmokeShard(1, QuerySmokeShard.Shards)
class QuerySmokeSpecC extends QuerySmokeShard(2, QuerySmokeShard.Shards)
class QuerySmokeSpecD extends QuerySmokeShard(3, QuerySmokeShard.Shards)
class QuerySmokeSpecE extends QuerySmokeShard(4, QuerySmokeShard.Shards)
class QuerySmokeSpecF extends QuerySmokeShard(5, QuerySmokeShard.Shards)

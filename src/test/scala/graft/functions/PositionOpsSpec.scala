package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel oracles for the positional-search expressions: each kernel is
  * checked against its direct (definitional) computation. */
class PositionOpsSpec extends AnyFunSuite {

  private def toks(ts: String*) =
    new GenericArrayData(ts.map(t =>
      if (t == null) null else UTF8String.fromString(t)).toArray[Any])

  private def ints(xs: Int*) = new GenericArrayData(xs.toArray[Any])

  test("termPositions: 1-based, ascending, null-safe") {
    val p = PositionOps.termPositions(toks("a", "b", "a", null, "a"),
      UTF8String.fromString("a"))
    assert((0 until p.numElements()).map(p.getInt) == Seq(1, 3, 5))
    assert(PositionOps.termPositions(toks("x"),
      UTF8String.fromString("a")).numElements() == 0)
  }

  test("minAbsDiff equals the brute-force cross product") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(8) + 1)(rnd.nextInt(50)).sorted
      val b = Seq.fill(rnd.nextInt(8) + 1)(rnd.nextInt(50)).sorted
      val brute = (for (x <- a; y <- b) yield math.abs(x - y)).min.toLong
      assert(PositionOps.minAbsDiff(ints(a: _*), ints(b: _*)) == brute,
        s"a=$a b=$b")
    }
    assert(PositionOps.minAbsDiff(ints(), ints(1)) == Long.MaxValue)
  }

  test("phraseCount counts overlapping matches; definitional check") {
    def brute(ts: Seq[String], ph: Seq[String]): Long =
      (0 to ts.length - ph.length)
        .count(i => ts.slice(i, i + ph.length) == ph).toLong
    val rnd = new scala.util.Random(11)
    val alpha = Seq("a", "b", "c")
    (0 until 200).foreach { _ =>
      val ts = Seq.fill(rnd.nextInt(12) + 1)(alpha(rnd.nextInt(3)))
      val ph = Seq.fill(rnd.nextInt(3) + 1)(alpha(rnd.nextInt(3)))
      assert(PositionOps.phraseCount(toks(ts: _*), toks(ph: _*)) ==
        brute(ts, ph), s"ts=$ts ph=$ph")
    }
    // the overlapping case from the index spec: "go go" over "go go go"
    assert(PositionOps.phraseCount(toks("go", "go", "go"),
      toks("go", "go")) == 2L)
    assert(PositionOps.phraseCount(toks("a"), toks()) == 0L)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.vector.TopKBuffer

/** Randomized (seeded, deterministic) property tests: the bounded heap
  * must agree with a full sort for any input, any insertion order, any
  * split across partial buffers. */
class TopKPropertySpec extends AnyFunSuite {

  private def reference(pairs: Seq[(Double, Long)], k: Int, asc: Boolean) = {
    val sorted = pairs.sortWith { case ((s1, i1), (s2, i2)) =>
      if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else i1 < i2
    }
    sorted.take(k)
  }

  private val rnd = new scala.util.Random(20260812L)

  private def randomPairs(): Seq[(Double, Long)] = {
    val n = rnd.nextInt(60)
    // small value/id domains force plenty of score ties and duplicates
    Seq.fill(n)((rnd.nextInt(12).toDouble / 2.0, rnd.nextInt(30).toLong))
  }

  test("heap equals sort-take-k for 500 random cases") {
    for (_ <- 1 to 500) {
      val pairs = randomPairs()
      val k = 1 + rnd.nextInt(10)
      val asc = rnd.nextBoolean()
      val buf = new TopKBuffer(k, asc)
      pairs.foreach { case (s, i) => buf.insert(s, i) }
      assert(buf.sortedPairs.toSeq == reference(pairs, k, asc),
        s"pairs=$pairs k=$k asc=$asc")
    }
  }

  test("merge of split buffers equals single buffer for 500 random cases") {
    for (_ <- 1 to 500) {
      val pairs = randomPairs()
      val k = 1 + rnd.nextInt(8)
      val cut = if (pairs.isEmpty) 0 else rnd.nextInt(pairs.length)
      val (l, r) = pairs.splitAt(cut)
      val a = new TopKBuffer(k, false); l.foreach { case (s, i) => a.insert(s, i) }
      val b = new TopKBuffer(k, false); r.foreach { case (s, i) => b.insert(s, i) }
      assert(a.mergeFrom(b).sortedPairs.toSeq == reference(pairs, k, asc = false))
    }
  }
}

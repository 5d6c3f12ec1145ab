package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming
import graft.streaming.Streaming.OpenSession

/** Randomized pinning of [[Streaming.coalesceSessions]] — the pure core
  * every stream≡batch session claim reduces to. If this merge is a proper
  * closure (same fixpoint under ANY batching of the events), then the
  * streaming operators' exactness only depends on watermark bookkeeping,
  * which the streaming specs cover; if it is not, no amount of
  * integration testing makes sessionization trustworthy.
  */
class SessionCoalesceSpec extends AnyFunSuite {

  private val Gap = 100L // micros, deliberately small so merges are dense

  private def coalesce(xs: List[OpenSession]): List[OpenSession] =
    Streaming.coalesceSessions(xs.sortBy(s => (s.start, s.lastTs)), Gap)

  /** Closed-form reference: sort event times, split where the gap is
    * exceeded — the q_sessionize rule, independently re-implemented. */
  private def reference(ts: Seq[Long]): List[OpenSession] = {
    val sorted = ts.sorted.toList
    if (sorted.isEmpty) Nil
    else sorted.tail.foldLeft(List(OpenSession(sorted.head, sorted.head, 1L))) {
      case (cur :: done, t) if t - cur.lastTs <= Gap =>
        OpenSession(cur.start, t, cur.n + 1) :: done
      case (acc, t) => OpenSession(t, t, 1L) :: acc
    }.reverse
  }

  test("coalesce reaches the same fixpoint under any chunking and any order (500 random cases)") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 500).foreach { i =>
      val n = 1 + rnd.nextInt(60)
      // cluster times around a few centers so gap-merges actually happen
      val ts = (1 to n).map(_ =>
        rnd.nextInt(8) * 1000L + rnd.nextInt(300).toLong).toVector
      val expected = reference(ts)

      // all-at-once
      assert(coalesce(ts.map(t => OpenSession(t, t, 1L)).toList) == expected, s"case $i direct")

      // random chunking of a random permutation, folded incrementally the
      // way the stateful operators do: state' = coalesce(state ++ chunk)
      val shuffled = rnd.shuffle(ts)
      var state = List.empty[OpenSession]
      var rest = shuffled
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(rest.length)
        val (chunk, tail) = rest.splitAt(k)
        state = coalesce(state ++ chunk.map(t => OpenSession(t, t, 1L)))
        rest = tail
      }
      assert(state == expected, s"case $i chunked (n=$n)")

      // structural invariants: disjoint with real gaps between sessions,
      // event count conserved
      expected.sliding(2).foreach {
        case List(a, b) => assert(b.start - a.lastTs > Gap, s"case $i gap")
        case _ => ()
      }
      assert(expected.map(_.n).sum == n, s"case $i count")
    }
  }
}

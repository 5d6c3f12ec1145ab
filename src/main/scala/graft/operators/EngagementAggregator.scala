package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A9 as a typed `Aggregator` — the one justified custom aggregate
  * (SURVEY.md §7.3): builds the per-user engagement change log
  * `ts -> [likes, replies, retweets]` (reference shape: readme.md:15,
  * consumed show.py:104-110) in a single pass, merging triples keyed by
  * timestamp as it goes instead of materializing a row per (user, ts) and
  * map-ifying afterwards.
  *
  * The buffer is bounded by the number of distinct timestamps per user (ts
  * is a coarse ingest/window stamp, not an event id), so partial states stay
  * small and merge cost is O(|buffer|) — the property that makes it safe as
  * a partial aggregate at scale.
  */
object EngagementAggregator {

  /** (ts, likes, replies, retweets) input row. */
  type In = (Long, Long, Long, Long)
  /** Buffer IS the output type: a native Catalyst map (typed
    * ExpressionEncoder, not Kryo bytes) — partial-agg state stays
    * inspectable and Tungsten-serializable, and shuffle rows carry the
    * compact map encoding instead of an opaque blob. */
  type Buf = Map[Long, Seq[Long]]
  type Out = Map[Long, Seq[Long]]

  val aggregator: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    override def zero: Buf = Map.empty

    private def add(b: Buf, ts: Long, v: Seq[Long]): Buf =
      b.updatedWith(ts) {
        case Some(prev) => Some(Seq(prev(0) + v(0), prev(1) + v(1), prev(2) + v(2)))
        case None => Some(v)
      }

    override def reduce(b: Buf, in: In): Buf =
      add(b, in._1, Seq(in._2, in._3, in._4))

    override def merge(a: Buf, b: Buf): Buf =
      b.foldLeft(a) { case (acc, (ts, v)) => add(acc, ts, v) }

    override def finish(b: Buf): Out = b

    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Out] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}

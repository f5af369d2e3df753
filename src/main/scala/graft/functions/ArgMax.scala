package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY.md §2.2 "UDAF surface"):
  * argmax-by-score with a total deterministic order — keeps the row
  * whose (score, id) is maximal, so ties on score resolve by highest id
  * identically on every partitioning.
  *
  * Registered via `functions.udaf`, which plugs an Aggregator into
  * Catalyst's partial/final aggregation: merge() runs map-side, so at
  * cluster scale each partition ships ONE candidate upward, not its
  * rows.
  */
case class ScoredId(id: Long, score: Double)

class ArgMaxById extends Aggregator[ScoredId, ScoredId, ScoredId] {
  private val empty = ScoredId(Long.MinValue, Double.NegativeInfinity)
  override def zero: ScoredId = empty
  private def better(a: ScoredId, b: ScoredId): ScoredId =
    if (a.score > b.score || (a.score == b.score && a.id > b.id)) a else b
  override def reduce(buf: ScoredId, in: ScoredId): ScoredId = better(buf, in)
  override def merge(a: ScoredId, b: ScoredId): ScoredId = better(a, b)
  override def finish(r: ScoredId): ScoredId = r
  override def bufferEncoder: Encoder[ScoredId] = Encoders.product[ScoredId]
  override def outputEncoder: Encoder[ScoredId] = Encoders.product[ScoredId]
}

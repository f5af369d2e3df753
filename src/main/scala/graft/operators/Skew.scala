package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (the explicit form; AQE's runtime skew-join
  * split is also enabled in Graft.session and covers sort-merge joins
  * adaptively).
  *
  * Salting targets the case AQE can't fix: a shuffle join where one key
  * carries a disproportionate share of BOTH sides' rows, or a
  * deterministic pre-AQE plan. The skewed side gets a uniform random-free
  * salt derived from existing row identity (deterministic — replays
  * identically), the other side is replicated across all salt values, and
  * the join key becomes (key, salt): the hot key's rows spread over
  * `saltFactor` reducers instead of one.
  */
object Skew {
  /** Deterministic salt in [0, saltFactor) from a row-identity column —
    * hash-based, so replays and retries land identically (no rand()). */
  def saltCol(identity: Column, saltFactor: Int): Column =
    pmod(hash(identity), lit(saltFactor))

  /** Join `big` (skewed on `bigKey`) with `small` (keyed `smallKey`),
    * spreading each of big's keys over `saltFactor` partitions.
    * `bigIdentity` is any column of `big` that varies within a key (a
    * row id) — it seeds the salt. Row-for-row equivalent to
    * `big.join(small, bigKey === smallKey)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 bigIdentity: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt_b", saltCol(col(bigIdentity), saltFactor))
    val replicated = small
      .withColumn("__salt_s", explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated,
        col(bigKey) === col(smallKey) && col("__salt_b") === col("__salt_s"))
      .drop("__salt_b", "__salt_s")
  }
}

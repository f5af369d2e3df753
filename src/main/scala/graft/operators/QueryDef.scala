package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the driver tables plus an
  * equivalent DuckDB SQL oracle (None ⇒ driver records a weaker
  * rows-only check — reserved for ops whose semantics SQL can't express,
  * e.g. engine-specific sketches).
  *
  * Determinism contract (required by the driver's hash compare):
  *  - output is fully ordered by exact-typed key columns, identically in
  *    both forms;
  *  - every computed column is aliased to the same name in both forms;
  *  - double aggregations route through DECIMAL so the result is
  *    independent of accumulation order (floating-point sums are not
  *    associative; a 1000-executor plan must hash-match a single-threaded
  *    oracle);
  *  - computed integers are cast to BIGINT in both forms (DuckDB's
  *    integer SUM widens to HUGEINT, which would not round-trip).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}

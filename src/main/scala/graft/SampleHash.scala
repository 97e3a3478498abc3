package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic Knuth-multiplicative selection hash shared by the sampling
  * operators (q25 deterministic sample, d14 stratified mix, d18 quota
  * sample, p19 training mix), in overflow-safe modular form.
  *
  * The raw form `id * 2654435761` overflows Long at id >= ~3.47e9: Spark
  * wraps silently while DuckDB raises a BIGINT overflow, so selections would
  * diverge (or the oracle would error) exactly at the corpus sizes this
  * engine targets. Reducing both operands mod P first keeps the product
  * under 2^60 for any 64-bit id while staying a pure function of id, so both
  * engines compute the identical value at any scale. Mirror the SQL with
  * [[sql]]; `%` and pmod agree because every operand is non-negative.
  */
object SampleHash {
  val P: Long = 1000000007L
  val K: Long = 2654435761L % P // Knuth's multiplier, reduced mod P

  /** h(id) in [0, P): overflow-safe on any BIGINT id. */
  def column(id: Column): Column = pmod(pmod(id, lit(P)) * lit(K), lit(P))

  /** DuckDB mirror of [[column]] for the oracle SQL. */
  def sql(idExpr: String): String = s"((($idExpr % $P) * $K) % $P)"
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated testdata tables.
  *
  * One reader per table so read options / schema hints live in exactly one
  * place. At 100 TB these would point at partitioned/bucketed table roots;
  * the API stays the same.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized parquet
    * reader rejects. Read nanos as long and floor-truncate to microseconds —
    * exactly what DuckDB's reader does — so both engines see identical values.
    *
    * INVARIANT: the session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (every graft entry point —
    * Bench/Verify/Explain/TimeQuery/test harness — sets it at construction).
    * It is NOT set here: a session-wide conf mutated as a read-time side
    * effect would silently change every other nanos-parquet read mid-session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
      "spark.sql.legacy.parquet.nanosAsLong=true")
    table(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

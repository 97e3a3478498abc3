package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The flagship composite: the whole reference pipeline as ONE declarative
  * plan — fetch (scan) -> clean -> analyze -> dedup -> render — that
  * Catalyst optimizes end to end. Mirrors master_script.process_page
  * (/root/reference/master_script.py:89-220) at corpus scale.
  */
object EndToEnd {

  def corpusPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)

    // 1. clean (t01 logic, inlined so the plan fuses)
    val cleaned = trim(regexp_replace($"text", "\\s+", " "))
    // 2. analyze: tokens + quality
    val tokens = size(split(cleaned, " ")).cast("long")
    val stop = regexp_count(lower(cleaned), lit("\\b(the|a|and|of|to|in|is)\\b")).cast("double")
    val quality = least(lit(1.0), length(cleaned) / lit(500.0)) * lit(0.6) +
      (stop / (tokens.cast("double") + lit(1.0))) * lit(0.4)
    // 3. exact-dedup survivors (min doc_id per normalized-content hash)
    val keeper = min($"doc_id").over(Window.partitionBy($"content_md5"))
    // 4. render survivors above the quality bar
    val enriched = docs
      .select($"doc_id", $"source", $"lang", cleaned.as("cleaned"),
              tokens.as("tokens"), quality.as("quality"),
              md5(lower(cleaned)).as("content_md5"))
      .withColumn("keeper_id", keeper)
      .filter($"doc_id" === $"keeper_id" && $"quality" >= 0.3)
    enriched.select(
      $"doc_id", $"source", $"lang", $"tokens", $"quality",
      concat(lit("<!DOCTYPE html><html><head><title>"),
             $"source", lit("/doc-"), $"doc_id",
             lit("</title></head><body><div class=\"content\">"),
             $"cleaned", lit("</div></body></html>")).as("html"))
      .orderBy($"doc_id")
  }
}

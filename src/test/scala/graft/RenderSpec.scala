package graft

import org.apache.spark.sql.functions._

class RenderSpec extends SparkSpec {

  test("q17 salted join equals the plain join") {
    val salted = SparkEntry.queries("q17_salted_join")(spark, sfDir).collect()
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("line_count"),
           sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("o_orderstatus").collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("q17 fact rows join exactly one salted dim copy each") {
    val factCount = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey")).count()
    val saltedTotal = SparkEntry.queries("q17_salted_join")(spark, sfDir)
      .agg(sum("line_count")).head().getLong(0)
    assert(saltedTotal == factCount)
  }

  test("p11 rendered html is well-formed at the shell level") {
    val df = SparkEntry.queries("p11_html_render")(spark, sfDir)
    assert(df.filter(!col("html").startsWith("<!DOCTYPE html>")).isEmpty)
    assert(df.filter(!col("html").endsWith("</html>")).isEmpty)
    assert(df.filter(!col("html").contains("<h1>")).isEmpty)
  }

  test("p12 data urls round-trip through base64") {
    import spark.implicits._
    val row = SparkEntry.queries("p12_attachment_embed")(spark, sfDir)
      .filter($"doc_id" === 7).head()
    val b64 = row.getAs[String]("data_url").split(",", 2)(1)
    val decoded = new String(java.util.Base64.getDecoder.decode(b64), "UTF-8")
    val text = Tables.documents(spark, sfDir).filter($"doc_id" === 7)
      .head().getAs[String]("text")
    assert(decoded == "IMG0" + text)
  }

  test("q16 json extraction finds k for every event") {
    val n = SparkEntry.queries("q16_json_extract")(spark, sfDir)
      .agg(sum("n")).head().getLong(0)
    assert(n == Tables.events(spark, sfDir).count())
  }
}

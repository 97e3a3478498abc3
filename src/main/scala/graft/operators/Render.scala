package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Output generation — the reference's HTML/attachment emitters re-expressed
  * as column pipelines (everything is a deterministic string/binary
  * transform, so it runs codegen'd and oracle-checkable).
  */
object Render {

  /** Full HTML document per page, mirroring the reference template's
    * structure (/root/reference/output_generator/html_generator.py:102-200):
    * doctype, head with charset/viewport/title/style, h1 + content div.
    */
  def htmlRender(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val title = concat($"source", lit("/doc-"), $"doc_id")
    val html = concat(
      lit("<!DOCTYPE html>\n<html>\n<head>\n" +
          "<meta charset=\"UTF-8\">\n" +
          "<meta name=\"viewport\" content=\"width=device-width, initial-scale=1.0\">\n" +
          "<title>"), title, lit("</title>\n" +
          "<style>body { font-family: Arial, sans-serif; line-height: 1.6; " +
          "max-width: 1200px; margin: 0 auto; padding: 20px; }</style>\n" +
          "</head>\n<body>\n<h1>"), title, lit("</h1>\n<div class=\"content\">\n"),
      $"text", lit("\n</div>\n</body>\n</html>"))
    Tables.documents(s, dir)
      .select($"doc_id", html.as("html"))
      .orderBy($"doc_id")
  }

  /** Base64 data-URL embedding of binary attachments, mirroring
    * html_generator._embed_images (html_generator.py:201-258).
    */
  def attachmentEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mime = when($"doc_id" % 3 === 0, "image/png").otherwise("image/jpeg")
    // Spark's base64 may MIME-chunk (CRLF every 76 chars); strip for the
    // canonical unwrapped form data URLs require.
    val dataUrl = concat(lit("data:"), mime, lit(";base64,"),
                         translate(base64(concat(lit("IMG0"), $"text").cast("binary")), "\r\n", ""))
    Tables.documents(s, dir)
      .select($"doc_id", mime.as("mime"), dataUrl.as("data_url"))
      .orderBy($"doc_id")
  }
}

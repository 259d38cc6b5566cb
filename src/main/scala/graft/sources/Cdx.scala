package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CDXJ crawl-index codec — the Common Crawl / Internet Archive index
  * format (public spec: each line is `<SURT key> <14-digit timestamp>
  * <JSON block>`, the JSON holding url/mime/status/length/… as
  * strings). A crawl consumer resolves "which WARC holds this URL" and
  * "what did we capture for this domain" through CDX, so a pipeline
  * that ingests WARC needs the index sibling.
  *
  * Both directions are plain column expressions (concat/to_json one
  * way, split/from_json back) — codegen'd, per-row, shuffle-free; at
  * 100 TB the index is just another columnar scan. Sorting/laying out
  * by the SURT key ([[graft.ops.Domains.surtKey]]) keeps one domain's
  * entries contiguous and range-prunable.
  */
object Cdx {

  private val JsonSchema = StructType.fromDDL(
    "url STRING, mime STRING, status STRING, length STRING")

  /** Compose one CDXJ line from typed columns (length may be any
    * numeric/string column; JSON block stores strings, per the spec).
    */
  def toCdxjLine(surt: Column, ts14: Column, url: Column, mime: Column,
      status: Column, length: Column): Column =
    concat_ws(" ", surt, ts14,
      to_json(struct(
        url.cast("string").as("url"),
        mime.cast("string").as("mime"),
        status.cast("string").as("status"),
        length.cast("string").as("length"))))

  /** Parse CDXJ lines (column `lineCol`) into typed fields. The JSON
    * block is the 3rd space-separated field onward (`split` with
    * limit 3 keeps spaces inside the JSON intact); unparseable lines
    * yield null fields rather than throwing.
    */
  def parseCdxj(lines: DataFrame, lineCol: String): DataFrame = {
    val parts = split(col(lineCol), " ", 3)
    // `get` (not getItem): a short split must yield nulls, not an
    // array-index error, on malformed lines
    lines
      .withColumn("surt", get(parts, lit(0)))
      .withColumn("cdx_ts", get(parts, lit(1)))
      .withColumn("__json", from_json(get(parts, lit(2)), JsonSchema))
      .select(col("surt"), col("cdx_ts"),
        col("__json.url").as("url"),
        col("__json.mime").as("mime"),
        col("__json.status").cast("int").as("status"),
        col("__json.length").cast("long").as("n_bytes"))
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL corpus ingestion — the wire format most raw text corpora actually
  * arrive in (one JSON object per line: Dolma, RedPajama, FineWeb releases).
  * Parses into the engine's `documents` shape with the same corrupt-handling
  * contract as [[EnvelopeJson]]: a malformed line must never kill a 100 TB
  * ingest — it is COUNTED and dropped, not thrown.
  *
  * Why `text` source + `from_json` instead of `spark.read.json`: the JSON
  * reader's PERMISSIVE mode needs a `_corrupt_record` column baked into the
  * schema and forbids projecting it without a cache; parsing explicitly from
  * the text source keeps corrupt accounting a plain filter, streams with
  * `readStream.text` unchanged, and never double-scans.
  *
  * Scale shape: text scan → one codegen'd `from_json` projection — narrow,
  * no shuffle; the corrupt counter is the caller's aggregation if they want
  * it ([[readWithCorrupt]] returns the flag column so one pass serves both).
  */
object DocumentsJsonl {

  /** The minimal corpus wire schema: id + text + optional source. Extra JSON
    * fields are ignored (forward-compatible releases); absent fields are
    * null and handled by the engine's NULL contracts downstream. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  /** Parse a text DataFrame of JSONL lines → (doc_id, text, source,
    * corrupt) — `corrupt` is true for unparsable lines or rows with no id
    * (both also arrive from truncated writes). Blank lines are corrupt too:
    * counting them keeps ingest accounting honest about file damage. */
  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines
      .select(from_json(col(lineCol), schema).as("d"))
      .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"),
        col("d.source").as("source"),
        (col("d").isNull || col("d.doc_id").isNull).as("corrupt"))

  /** Read a JSONL path into the documents shape, corrupt lines dropped. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path)).filter(!col("corrupt"))
      .drop("corrupt")

  /** Same single pass, keeping the corrupt flag for ingest accounting
    * (`df.filter(col("corrupt")).count()` is the dropped-line counter the
    * reference logs per malformed message, server.go:307-313). */
  def readWithCorrupt(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}

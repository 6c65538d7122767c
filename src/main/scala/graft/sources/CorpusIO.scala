package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the de-facto exchange format of LLM data
  * pipelines (one JSON object per line; every major open corpus ships
  * this way).
  *
  * Scale rules baked in:
  *  - reads take an EXPLICIT schema, never `inferSchema` — inference is
  *    a full extra pass over the corpus (at 100 TB, a second 100 TB
  *    scan) and silently widens types on dirty data;
  *  - reads default to FAILFAST so a corrupt line stops the job instead
  *    of becoming a row of nulls that poisons downstream dedup keys
  *    (pass `permissive = true` to triage, which routes bad lines to
  *    `_corrupt_record` instead);
  *  - writes go through the engine (distributed, one file per task) —
  *    partition count, and therefore file sizing, is the caller's lever.
  */
object CorpusIO {

  /** The `documents` table schema (TESTDATA.md). */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = documentSchema,
      permissive: Boolean = false): DataFrame = {
    val base = spark.read
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
    val s = if (permissive)
      schema.add(StructField("_corrupt_record", StringType)) else schema
    base.schema(s).json(path)
  }

  /** ORC interchange (the columnar archive format next to parquet in
    * warehouse estates): same engine-native pushdown/pruning contract
    * as the parquet sources — predicate pushdown and column pruning
    * reach the ORC reader (asserted in SourcesSpec), zlib by default. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "zlib").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

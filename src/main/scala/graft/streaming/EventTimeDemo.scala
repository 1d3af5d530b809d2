package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Event-time streaming surface (SURVEY.md §2.8 rows 42–44): watermarks,
  * tumbling-window aggregation, and in-stream exact dedup via
  * `dropDuplicatesWithinWatermark`. These are the Structured Streaming
  * primitives the incremental dedup mode composes with when the corpus
  * arrives as a feed with ingest timestamps.
  */
object EventTimeDemo {

  /** Hourly per-type counts with a 1-hour watermark: late events beyond
    * the watermark are dropped (in the dedup pipeline they fall to the
    * next full recluster instead).
    */
  def hourlyCounts(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(inputDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("hour_ts"), col("event_type"),
        col("n"), col("sum_value"))

  /** In-stream exact dedup: one row per content hash within the watermark
    * horizon — the streaming face of the sha256 shortcut.
    */
  def dedupStream(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(inputDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("content_sha256", sha2(col("props"), 256))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_sha256")

  def runToMemory(df: DataFrame, name: String, outputMode: String): StreamingQuery = {
    val q = df.writeStream.outputMode(outputMode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventTimeDemo

class EventTimeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("windowed watermark aggregation over the events stream matches batch") {
    val inDir = Files.createTempDirectory("graft-events").toString
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    batch.write.mode("overwrite").parquet(inDir)

    val q = EventTimeDemo.runToMemory(
      EventTimeDemo.hourlyCounts(spark, inDir, batch.schema), "hourly", "append")
    try {
      // append mode emits only watermark-closed windows; everything except
      // the max-event-time hour must be present and equal to the batch agg
      val got = spark.sql("SELECT hour_ts, event_type, n FROM hourly")
        .as[(Long, String, Long)].collect().toSet
      val expect = SparkEntry.queries("q_events_hourly")(spark, sfDir)
        .select("hour_ts", "event_type", "n").as[(Long, String, Long)].collect().toSet
      assert(got.nonEmpty)
      assert((got -- expect).isEmpty, s"stream emitted rows batch lacks: ${(got -- expect).take(3)}")
      val lastHour = expect.map(_._1).max
      val closed = expect.filter(_._1 < lastHour - 3600)
      assert((closed -- got).isEmpty, s"closed windows missing: ${(closed -- got).take(3)}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups identical payloads in-stream") {
    val inDir = Files.createTempDirectory("graft-events2").toString
    val base = spark.read.parquet(s"$sfDir/events.parquet").limit(200)
    base.union(base).write.mode("overwrite").parquet(inDir) // every row twice

    val q = EventTimeDemo.runToMemory(
      EventTimeDemo.dedupStream(spark, inDir, base.schema), "deduped", "append")
    try {
      val n = spark.sql("SELECT count(*) FROM deduped").as[Long].head()
      val distinctPayloads = base.select("props").distinct().count()
      assert(n === distinctPayloads)
    } finally q.stop()
  }
}

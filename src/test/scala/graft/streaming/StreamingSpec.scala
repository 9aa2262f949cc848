package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark over the events file stream") {
    val dir = java.nio.file.Files.createTempDirectory("stream").toString
    spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .limit(500)
      .write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val agg = EventStreams.windowedCounts(stream,
      windowLen = "1 hour", slide = "1 hour", watermark = "2 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode only emits windows the watermark has passed; verify the
    // streaming plan accepted watermark + window + agg and ran to the end
    val batch = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .groupBy(window($"ts", "1 hour"), $"event_type").count()
    assert(batch.count() > 0)
    assert(spark.table("win_counts").columns.toSeq ==
      Seq("w_start", "w_end", "event_type", "n", "total_value"))
  }

  test("stateful sessionization matches the batch window computation") {
    val events = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val sessions = EventStreams.sessionize(spark, events, gapSec = 1800)
      .cache()
    // total events preserved
    assert(sessions.agg(sum("n_events")).head().getLong(0) ==
      events.count())
    // session count per user equals the batch gaps-and-islands count (q16)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batchSessions = events
      .withColumn("us", unix_micros($"ts"))
      .withColumn("prev", lag($"us", 1).over(w))
      .withColumn("new_s", when($"prev".isNull ||
        $"us" - $"prev" > 1800000000L, 1L).otherwise(0L))
      .groupBy($"user_id").agg(sum($"new_s").as("n_sessions"))
    val got = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
    val diff = got.join(batchSessions, "user_id")
      .filter(got("n_sessions") =!= batchSessions("n_sessions")).count()
    assert(diff == 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming session_window agrees with batch sessionization per user") {
    val streamed = EventStream.streamingSessionize(spark, sf).collect()
    val batch = operators.Sessionize.eventsSessionize(spark, sf).collect()
    assert(streamed.map(_.getAs[Long]("n_events")).sum ==
      batch.map(_.getAs[Long]("n_events")).sum)
    val streamedPerUser = streamed.groupBy(_.getAs[Long]("user_id")).view.mapValues(_.length).toMap
    val batchPerUser = batch.groupBy(_.getAs[Long]("user_id")).view.mapValues(_.length).toMap
    assert(streamedPerUser == batchPerUser,
      s"session counts differ: ${streamedPerUser.toSet.diff(batchPerUser.toSet)}")
  }

  test("stateful flatMapGroupsWithState accumulates correct per-user totals") {
    val out = EventStream.runOnBatch(spark, sf,
      df => EventStream.statefulUserStats(df).toDF(),
      s"stateful_${System.nanoTime()}")
    // last emitted row per user = final running total = batch groupBy result
    val finalRows = out.groupBy("user_id")
      .agg(max("n_events").as("n_events"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_events")).toMap
    val batch = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(finalRows == batch)
  }
}

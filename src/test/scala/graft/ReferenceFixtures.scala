package graft

import graft.datagen.Generator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.Instant

/** Bronze-shaped fixtures from the seeded generator, shared by
  * ReferenceModelsSpec (pure transforms) and ReferencePipelineSpec
  * (materializing runner). Deterministic: one seed, and simulate(h) is a
  * prefix of simulate(h') for h < h' (the rng is consumed hour by hour),
  * so a longer run is the same data plus new hours — exactly an
  * incremental batch. */
object ReferenceFixtures {

  def bronze(spark: SparkSession, hours: Int, sessionsPerHour: Int = 40)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val gen = new Generator(seed = 894L)
    val sim = gen.simulate(Instant.parse("2024-06-01T00:00:00Z"),
      hours, sessionsPerHour)
    val events = sim.zipWithIndex.flatMap { case ((evs, _), h) =>
      evs.map(e => (e.eventId, e.eventType, e.version, e.userId,
        e.sessionId, e.productId, java.sql.Timestamp.from(e.eventTime),
        java.sql.Timestamp.from(e.sourceIngestedAt), e.device, e.country,
        e.userAgent, e.referrer, e.experimentId, h.toLong))
    }.toDF("event_id", "event_type", "version", "user_id", "session_id",
      "product_id", "event_time", "source_ingested_at", "device", "country",
      "user_agent", "referrer", "experiment_id", "batch_id")
      .withColumn("pipeline_ingested_at", col("source_ingested_at"))
    val orders = sim.zipWithIndex.flatMap { case ((_, ords), h) =>
      ords.map(o => (o.orderId, o.sessionId, o.userId,
        o.items.map(i => (i.productId, i.quantity, i.price)),
        o.orderStatus, java.sql.Timestamp.from(o.orderTime),
        java.sql.Timestamp.from(o.sourceIngestedAt), h.toLong))
    }.toDF("order_id", "session_id", "user_id", "items_raw",
      "order_status", "order_time", "source_ingested_at", "batch_id")
      .withColumn("items", expr(
        "transform(items_raw, x -> named_struct(" +
          "'product_id', x._1, 'quantity', x._2, 'price', x._3))"))
      .drop("items_raw")
      .withColumn("pipeline_ingested_at", col("source_ingested_at"))
    (events, orders)
  }
}

package graft.datagen

import java.time.Instant
import scala.util.Random

/** Seeded, deterministic re-expression of the reference's simulation
  * (producers/linked_clickstream_order_generator.py and
  * producers/product_list.py in mattyg3/ecommerce_analytics_platform) —
  * same entity shapes and pathologies, written fresh for test fixtures:
  *
  *  - product catalog: "SKU-%05d" ids, tiered prices (product_list.py:5-39)
  *  - sessions walk the view→cart→checkout→purchase funnel with
  *    diminishing probabilities (producer :68-80, :222-257)
  *  - schema versioning: ~30% of sessions emit v2 events carrying
  *    user_agent/referrer/experiment_id, v1 events leave them null (:180,
  *    :162-167)
  *  - late events: ~15% shifted up to 10 min earlier than arrival (:82-83)
  *  - duplicates: a fraction of batches re-append an event/order (:366-371)
  *  - orders carry an items ARRAY<STRUCT<product_id,quantity,price>> and
  *    are 'completed' ~97% / 'cancelled' otherwise (:266-292)
  *
  * Unlike the reference (unseeded `random`), everything here derives from
  * one seed — fixtures are exactly reproducible.
  */
final class Generator(seed: Long = 894L) {

  final case class Product(productId: String, priceUsd: Double)
  final case class Event(eventId: String, eventType: String, version: String,
      userId: String, sessionId: String, productId: Option[String],
      eventTime: Instant, sourceIngestedAt: Instant,
      device: String, country: String, userAgent: Option[String],
      referrer: Option[String], experimentId: Option[String])
  final case class Item(productId: String, quantity: Int, price: Double)
  final case class Order(orderId: String, sessionId: String, userId: String,
      items: Seq[Item], orderStatus: String, orderTime: Instant,
      sourceIngestedAt: Instant)

  private val rng = new Random(seed)
  private def uuid(): String =
    new java.util.UUID(rng.nextLong(), rng.nextLong()).toString

  val products: IndexedSeq[Product] = {
    val r = new Random(seed)
    (0 until 1500).map { i =>
      val tier = r.nextDouble() match {
        case d if d < 0.50 => 5.0 + r.nextDouble() * 45     // budget
        case d if d < 0.80 => 50.0 + r.nextDouble() * 150   // mid
        case d if d < 0.95 => 200.0 + r.nextDouble() * 600  // premium
        case _             => 800.0 + r.nextDouble() * 4200 // luxury
      }
      Product(f"SKU-$i%05d", math.round(tier * 100).toDouble / 100)
    }
  }

  private val devices = Seq("mobile", "desktop", "tablet")
  private val countries = Seq("US", "GB", "DE", "FR", "JP")

  /** One session's funnel walk; returns (events, maybe order). */
  def session(simTime: Instant, knownUser: Option[String])
      : (Seq[Event], Option[Order]) = {
    val userId = knownUser.getOrElse(uuid())
    val sessionId = uuid()
    val v2 = rng.nextDouble() < 0.30
    val version = if (v2) "2" else "1"
    val device = devices(rng.nextInt(devices.size))
    val country = countries(rng.nextInt(countries.size))
    val ua = if (v2) Some(s"agent/$device") else None
    val ref = if (v2) Some(Seq("search", "social", "direct")(rng.nextInt(3)))
      else None
    val exp = if (v2) Some(s"exp-${rng.nextInt(5)}") else None

    var t = simTime.plusSeconds(rng.nextInt(60).toLong)
    val events = Seq.newBuilder[Event]
    def emit(typ: String, product: Option[String]): Unit = {
      // 15% late: event_time up to 10 min before its arrival order
      val late = if (rng.nextDouble() < 0.15)
        rng.nextInt(600).toLong else 0L
      val et = t.minusSeconds(late)
      events += Event(uuid(), typ, version, userId, sessionId, product,
        et, t.plusSeconds(rng.nextInt(20).toLong), device, country,
        ua, ref, exp)
      t = t.plusSeconds((10 + rng.nextInt(110)).toLong)
    }

    emit("page_view", None)
    val cart = Seq.newBuilder[Item]
    val nProducts = 1 + rng.nextInt(5)
    (0 until nProducts).foreach { _ =>
      if (rng.nextDouble() < 0.75) {
        val p = products(rng.nextInt(products.size))
        emit("view_product", Some(p.productId))
        if (rng.nextDouble() < 0.4) {
          emit("add_to_cart", Some(p.productId))
          cart += Item(p.productId, 1 + rng.nextInt(3), p.priceUsd)
        }
      }
    }
    val items = cart.result()
    val order: Option[Order] =
      if (items.nonEmpty && rng.nextDouble() < 0.6) {
        emit("checkout_start", None)
        if (rng.nextDouble() < 0.7) {
          emit("purchase", None)
          val status = if (rng.nextDouble() < 0.97) "completed" else "cancelled"
          // orders arrive delayed (producer :119-129), <= 15 min
          val delay = rng.nextInt(900).toLong
          Some(Order(uuid(), sessionId, userId, items, status, t,
            t.plusSeconds(delay)))
        } else None
      } else None
    (events.result(), order)
  }

  /** Simulate `hours` sim-hours at `sessionsPerHour`; returns batches of
    * (events, orders) per hour with duplicate injection. */
  def simulate(start: Instant, hours: Int, sessionsPerHour: Int)
      : Seq[(Seq[Event], Seq[Order])] = {
    val buf = Seq.newBuilder[(Seq[Event], Seq[Order])]
    simulateEach(start, hours, sessionsPerHour)((_, e, o) => buf += ((e, o)))
    buf.result()
  }

  /** Streaming form of [[simulate]]: hands each hour's batch to `f` as it
    * is generated instead of materializing all hours — identical data for
    * the same seed (the rng is consumed hour by hour in the same order).
    * The e2e pipeline bench uses this to write a 24 h dataset with one
    * hour resident at a time.
    *
    * `sessionSpacingSec` is the sim-time gap between consecutive session
    * starts. The default 7 s matches the historical fixture shape (40
    * sessions/hour specs) EXACTLY; at high rates pass ~3600/rate so an
    * hour's sessions START WITHIN THAT HOUR — the reference generator
    * emits sessions at simulated-now (its sim clock advances through the
    * hour, producer :386), and the dbt-style 1-day lookbacks downstream
    * assume sources arrive roughly in event-time order. A spacing that
    * stretches an "hour" across days breaks that contract and
    * manufactures cross-model watermark skew no real producer exhibits
    * (found by the day-2 incremental pipeline bench). */
  def simulateEach(start: Instant, hours: Int, sessionsPerHour: Int,
      sessionSpacingSec: Double = 7.0)
      (f: (Int, Seq[Event], Seq[Order]) => Unit): Unit = {
    val knownUsers = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until hours).foreach { h =>
      val t0 = start.plusSeconds(h * 3600L)
      val evs = Seq.newBuilder[Event]
      val ords = Seq.newBuilder[Order]
      (0 until sessionsPerHour).foreach { i =>
        val known = if (knownUsers.nonEmpty && rng.nextDouble() < 0.30)
          Some(knownUsers(rng.nextInt(knownUsers.size))) else None
        val (e, o) = session(
          t0.plusSeconds((i * sessionSpacingSec).toLong), known)
        if (known.isEmpty && knownUsers.size < 50000)
          knownUsers += e.head.userId
        evs ++= e; ords ++= o
      }
      var events = evs.result(); var orders = ords.result()
      // duplicate injection: 5% of event batches, 2% of order batches
      if (rng.nextDouble() < 0.05 && events.nonEmpty)
        events = events :+ events(rng.nextInt(events.size))
      if (rng.nextDouble() < 0.02 && orders.nonEmpty)
        orders = orders :+ orders(rng.nextInt(orders.size))
      f(h, events, orders)
    }
  }

  /** JSON-lines encoders (S11 fixture sink shape). */
  def eventJson(e: Event): String = {
    def s(v: String) = "\"" + v + "\""
    def opt(v: Option[String]) = v.map(s).getOrElse("null")
    s"""{"event_id":${s(e.eventId)},"event_type":${s(e.eventType)},""" +
      s""""version":${s(e.version)},"user_id":${s(e.userId)},""" +
      s""""session_id":${s(e.sessionId)},"product_id":${opt(e.productId)},""" +
      s""""event_time":${s(e.eventTime.toString)},""" +
      s""""ingest_time":${s(e.sourceIngestedAt.toString)},""" +
      s""""device":${s(e.device)},"country":${s(e.country)},""" +
      s""""user_agent":${opt(e.userAgent)},"referrer":${opt(e.referrer)},""" +
      s""""experiment_id":${opt(e.experimentId)}}"""
  }

  def orderJson(o: Order): String = {
    def s(v: String) = "\"" + v + "\""
    val items = o.items.map(i =>
      s"""{"product_id":${s(i.productId)},"quantity":${i.quantity},""" +
        s""""price":${i.price}}""").mkString("[", ",", "]")
    s"""{"order_id":${s(o.orderId)},"session_id":${s(o.sessionId)},""" +
      s""""user_id":${s(o.userId)},"items":$items,""" +
      s""""order_status":${s(o.orderStatus)},""" +
      s""""order_time":${s(o.orderTime.toString)},""" +
      s""""ingest_time":${s(o.sourceIngestedAt.toString)}}"""
  }
}

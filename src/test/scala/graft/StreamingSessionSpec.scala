package graft

import graft.streaming.StreamingModels
import graft.streaming.StreamingModels.{SessClosed, SessEvt}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Gap-based streaming sessionization: multi-batch MemoryStream with
  * event-time timeouts must emit the same sessions the batch
  * sessionize logic defines (gap 1800 s). */
class StreamingSessionSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("streaming heavy hitters emit a bounded day summary with SpaceSaving bounds") {
    import graft.streaming.StreamingModels.{HHEvt, HHOut}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[HHEvt]
    val q = StreamingModels.heavyHittersStream(in.toDS(), k = 3)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("hh").start()
    try {
      // day 0 (epoch day): heavy user 100 (6 events) + 5 light users
      // (2 each) through a 3-counter summary, across two triggers
      val day0 = (1 to 3).map(i => HHEvt(100L, ts(1000L + i))) ++
        Seq(HHEvt(1L, ts(2000)), HHEvt(2L, ts(2100)), HHEvt(3L, ts(2200)))
      in.addData(day0: _*)
      q.processAllAvailable()
      val day0b = (4 to 6).map(i => HHEvt(100L, ts(3000L + i))) ++
        Seq(HHEvt(1L, ts(4000)), HHEvt(2L, ts(4100)), HHEvt(3L, ts(4200)),
          HHEvt(4L, ts(4300)), HHEvt(5L, ts(4400)))
      in.addData(day0b: _*)
      q.processAllAvailable()
      assert(spark.table("hh").count() === 0, "day still open")

      // next-day event advances the watermark past day 0's end →
      // the day-0 summary times out and emits its top-3
      in.addData(HHEvt(9L, ts(86400L + 10L)))
      q.processAllAvailable()
      in.addData(HHEvt(9L, ts(86400L + 11L)))
      q.processAllAvailable()

      val got = spark.table("hh").as[HHOut].collect().sortBy(_.rank)
      assert(got.length === 3, s"summary must emit exactly k rows: ${got.toSeq}")
      assert(got.forall(_.day_i === 0L))
      // true counts: 100→6, users 1-3→2, 4-5→1 (14 events total)
      val truth = Map(100L -> 6L, 1L -> 2L, 2L -> 2L, 3L -> 2L,
        4L -> 1L, 5L -> 1L)
      got.foreach { h =>
        val t = truth(h.user_id)
        assert(t <= h.est && h.est <= t + h.err,
          s"SpaceSaving bound violated for ${h.user_id}: est=${h.est} " +
            s"err=${h.err} true=$t")
      }
      // the heavy user must surface at rank 1 with an exact count
      // (it entered the summary before capacity pressure)
      assert(got.head.user_id === 100L && got.head.est === 6L &&
        got.head.err === 0L, s"heavy user wrong: ${got.head}")
    } finally q.stop()
  }

  test("sessions close on gap within a batch and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessEvt]
    val q = StreamingModels.sessionizeStream(in.toDS(), gapSec = 1800L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions").start()
    try {
      // batch 1: user 1 two close events; user 2 one event
      in.addData(
        SessEvt(1L, ts(1000), 1L, 100L),
        SessEvt(1L, ts(1500), 2L, 200L),
        SessEvt(2L, ts(1200), 3L, 50L))
      q.processAllAvailable()
      // nothing closed yet — all sessions still open
      assert(spark.table("sessions").count() === 0)

      // batch 2: user 1 event far beyond the gap → closes the first
      // session in-batch; also advances the watermark to 10000 s,
      // which times out user 2's idle session (1200 + 1800 < 10000)
      in.addData(SessEvt(1L, ts(10000), 4L, 300L))
      q.processAllAvailable()
      // one more empty batch so timeout processing runs after the
      // watermark advanced
      in.addData(SessEvt(3L, ts(10001), 5L, 1L))
      q.processAllAvailable()

      val got = spark.table("sessions").as[SessClosed].collect()
        .map(s => (s.user_id, s.start_s, s.end_s, s.n_events, s.sum_cents))
        .toSet
      assert(got.contains((1L, 1000L, 1500L, 2L, 300L)),
        s"user 1 first session wrong: $got")
      assert(got.contains((2L, 1200L, 1200L, 1L, 50L)),
        s"user 2 idle session not flushed by timeout: $got")
      // user 1's second session (10000) and user 3's are still open
      assert(got.size === 2, s"unexpected extra sessions: $got")
    } finally q.stop()
  }

  test("two same-trigger strays within gapSec merge into one earlier session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessEvt]
    val q = StreamingModels.sessionizeStream(in.toDS(), gapSec = 1800L,
        delayThreshold = "3 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_strays").start()
    try {
      in.addData(SessEvt(1L, ts(10000), 1L, 100L))
      q.processAllAvailable()
      // both strays precede the open session's start by > gapSec and
      // lie within gapSec of EACH OTHER: the batch twin puts them in
      // ONE session — so must the stream when they share a trigger
      in.addData(SessEvt(1L, ts(5000), 2L, 40L),
        SessEvt(1L, ts(5500), 3L, 5L))
      q.processAllAvailable()
      val got = spark.table("sessions_strays").as[SessClosed].collect()
        .map(s => (s.user_id, s.start_s, s.end_s, s.n_events, s.sum_cents))
        .toSet
      assert(got === Set((1L, 5000L, 5500L, 2L, 45L)),
        s"adjacent strays must merge: $got")
    } finally q.stop()
  }

  test("with lateness allowed, a pre-start stray splits into its own session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessEvt]
    // 3-hour lateness: the out-of-order event below is NOT dropped at
    // the watermark, so it must be handled by the session state itself
    val q = StreamingModels.sessionizeStream(in.toDS(), gapSec = 1800L,
        delayThreshold = "3 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_late").start()
    try {
      // batch 1: user 1 opens a session at t=10000
      in.addData(SessEvt(1L, ts(10000), 1L, 100L))
      q.processAllAvailable()
      // batch 2: an event at t=5000 — more than gapSec BEFORE the open
      // session's start (5000 < 10000 - 1800). The batch twin puts it
      // in its own session; the stream must emit it as a closed
      // singleton and leave the open session intact.
      in.addData(SessEvt(1L, ts(5000), 2L, 40L))
      q.processAllAvailable()
      val afterStray = spark.table("sessions_late").as[SessClosed].collect()
        .map(s => (s.user_id, s.start_s, s.end_s, s.n_events, s.sum_cents))
        .toSet
      assert(afterStray === Set((1L, 5000L, 5000L, 1L, 40L)),
        s"stray must close as its own singleton: $afterStray")
      // batch 3: an in-gap extension proves the open session survived
      // the stray (end moves 10000 → 11000, sum 100+7)
      in.addData(SessEvt(1L, ts(11000), 3L, 7L))
      q.processAllAvailable()
      // advance the watermark far past end+gap to flush it
      // (watermark = 100000 - 3h = 89200 > 11000 + 1800)
      in.addData(SessEvt(9L, ts(100000), 4L, 1L))
      q.processAllAvailable()
      in.addData(SessEvt(9L, ts(100001), 5L, 1L))
      q.processAllAvailable()
      val got = spark.table("sessions_late").as[SessClosed].collect()
        .map(s => (s.user_id, s.start_s, s.end_s, s.n_events, s.sum_cents))
        .toSet
      assert(got.contains((1L, 10000L, 11000L, 2L, 107L)),
        s"open session corrupted by the stray: $got")
    } finally q.stop()
  }
}

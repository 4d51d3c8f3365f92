package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{SessionInput, UserSession}
import java.sql.Timestamp

/** The stateful streaming transforms under the RocksDB state store —
  * the provider a 100 TB deployment runs (state spills to local disk
  * + changelog instead of living on the JVM heap). Asserts the same
  * results as the default HDFS-backed provider AND that watermark
  * advance actually EVICTS state rows (via the progress metrics), so
  * state stays bounded on an unbounded stream.
  *
  * providerClass is a per-query conf read at stream start, so it's
  * runtime-settable on the shared test session and restored after.
  */
class RocksDbStreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  def withRocksDb[A](f: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  def ckpt(): String =
    java.nio.file.Files.createTempDirectory("rocks_ckpt").toString

  val Base = 1704067200000L // 2024-01-01T00:00:00Z — clear of epoch 0
  def ts(minutes: Long): Timestamp = new Timestamp(Base + minutes * 60000L)

  test("sessionization on RocksDB: batch-equal results, state evicted on watermark advance") {
    withRocksDb {
      import spark.implicits._
      val rows = Seq(
        SessionInput(1L, ts(0), 1.0), SessionInput(1L, ts(10), 2.0),
        SessionInput(1L, ts(70), 4.0),
        SessionInput(2L, ts(5), 10.0))
      val mem = MemoryStream[SessionInput](spark)
      val q = EventStreams.sessionizeStream(mem.toDS(), gapMs = 30L * 60000L)
        .writeStream.format("memory").queryName("rocks_sessions")
        .option("checkpointLocation", ckpt())
        .outputMode("append").start()
      try {
        mem.addData(rows: _*)
        q.processAllAvailable()
        // user 1's 0–10 min session closed in-batch (gap exceeded
        // inside the same micro-batch); open: user 1 @70, user 2 @5
        val open = q.lastProgress.stateOperators.head.numRowsTotal
        assert(open == 2, s"expected 2 open sessions in state, got $open")
        assert(q.lastProgress.stateOperators.head.customMetrics
          .containsKey("rocksdbSstFileSize"),
          "progress metrics are not RocksDB's — provider not in effect")

        // advance the watermark (+2 h delay) far past every session:
        // all three time out, emit, and their state rows are removed
        mem.addData(SessionInput(99L, ts(10000), 0.0))
        q.processAllAvailable()
        mem.addData(SessionInput(99L, ts(10001), 0.0))
        q.processAllAvailable()

        val got = spark.table("rocks_sessions").as[UserSession]
          .collect().filter(_.user_id != 99L)
          .map(s => (s.user_id, (s.session_start.getTime - Base) / 60000L,
            (s.session_end.getTime - Base) / 60000L, s.n_events, s.sum_value))
          .toSet
        val batch = EventStreams.sessionizeBatch(
            rows.toDF(), gapMs = 30L * 60000L)
          .collect()
          .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - Base) / 60000L,
            (r.getTimestamp(2).getTime - Base) / 60000L, r.getInt(3),
            r.getDouble(4)))
          .toSet
        assert(got == batch)

        val left = q.lastProgress.stateOperators.head.numRowsTotal
        assert(left == 1, s"closed sessions not evicted: $left state rows")
      } finally q.stop()
    }
  }

  test("streaming dedup on RocksDB: cross-batch dedup, expired keys evicted") {
    withRocksDb {
      import spark.implicits._
      val mem = MemoryStream[(Timestamp, String)](spark)
      val q = EventStreams.streamingDedup(
          mem.toDS().toDF("ts", "text"), "ts", "text")
        .writeStream.format("memory").queryName("rocks_dedup")
        .option("checkpointLocation", ckpt())
        .outputMode("append").start()
      try {
        mem.addData((ts(0), "doc A"), (ts(1), "doc A"), (ts(2), "doc B"))
        q.processAllAvailable()
        mem.addData((ts(5), "doc A"), (ts(6), "doc C")) // later batch dup
        q.processAllAvailable()
        val texts = spark.table("rocks_dedup")
          .collect().map(_.getString(1)).sorted.toSeq
        assert(texts == Seq("doc A", "doc B", "doc C"))
        assert(q.lastProgress.stateOperators.head.numRowsTotal == 3)

        // watermark (1 h delay) sweeps past every stored hash → evict
        mem.addData((ts(10000), "doc Z"))
        q.processAllAvailable()
        mem.addData((ts(10001), "doc Z2"))
        q.processAllAvailable()
        val left = q.lastProgress.stateOperators.head.numRowsTotal
        assert(left <= 2, s"expired dedup keys not evicted: $left")
      } finally q.stop()
    }
  }

  test("session paths on RocksDB: batch-equal ordered paths, state evicted") {
    withRocksDb {
      import spark.implicits._
      import EventStreams.{PathInput, SessionPathRow}
      val mem = MemoryStream[PathInput](spark)
      val q = EventStreams.sessionPathsStream(mem.toDS(), gapMs = 30L * 60000L)
        .writeStream.format("memory").queryName("rocks_paths")
        .option("checkpointLocation", ckpt())
        .outputMode("append").start()
      val rows = Seq(
        PathInput(1L, ts(0), 10L, "view"),
        PathInput(1L, ts(20), 12L, "purchase"),
        PathInput(1L, ts(70), 13L, "view"), PathInput(1L, ts(70), 14L, "error"),
        PathInput(2L, ts(5), 20L, "signup"))
      try {
        mem.addData(rows.take(2): _*)
        q.processAllAvailable()
        // late-but-in-gap event lands in RocksDB state across batches —
        // the close-time sort must still order view>click>purchase
        mem.addData(PathInput(1L, ts(10), 11L, "click"))
        q.processAllAvailable()
        mem.addData(rows.drop(2): _*)
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.head.customMetrics
          .containsKey("rocksdbSstFileSize"),
          "progress metrics are not RocksDB's — provider not in effect")
        mem.addData(PathInput(99L, ts(10000), 990L, "view")) // advance wm
        q.processAllAvailable()
        mem.addData(PathInput(99L, ts(10001), 991L, "view"))
        q.processAllAvailable()

        val got = spark.table("rocks_paths").as[SessionPathRow]
          .collect().filter(_.user_id != 99L)
          .map(r => (r.user_id, r.session_start_ms / 60000L % 100000L, r.path))
          .toSet
        val batch = EventStreams.sessionPathRows(
            (rows :+ PathInput(1L, ts(10), 11L, "click")).toDF(),
            gapMs = 30L * 60000L)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1) / 60000L % 100000L,
            r.getString(2)))
          .toSet
        assert(got == batch)
        assert(got.map(t => (t._1, t._3)) == Set(
          (1L, "view>click>purchase"), (1L, "view>error"), (2L, "signup")))

        val left = q.lastProgress.stateOperators.head.numRowsTotal
        assert(left <= 1, s"closed path sessions not evicted: $left")
      } finally q.stop()
    }
  }

  test("windowed count-min on RocksDB: byte-identical grids to batch " +
      "across micro-batches") {
    withRocksDb {
      import spark.implicits._
      import org.apache.spark.sql.functions.unix_millis
      val rows = Seq(
        SessionInput(1L, ts(0), 1.0), SessionInput(7L, ts(10), 2.0),
        SessionInput(7L, ts(20), 3.0), SessionInput(1L, ts(70), 4.0),
        SessionInput(9L, ts(75), 5.0), SessionInput(2L, ts(80), 6.0))
      val mem = MemoryStream[SessionInput](spark)
      val q = EventStreams.windowUserCms(mem.toDS().toDF(), 4, 16)
        .writeStream.format("memory").queryName("rocks_cms")
        .option("checkpointLocation", ckpt())
        .outputMode("complete").start()
      try {
        // split mid-window: micro-batch 2's partial grid must fold
        // into window state held by RocksDB
        mem.addData(rows.take(2): _*)
        q.processAllAvailable()
        mem.addData(rows.drop(2): _*)
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.head.customMetrics
          .containsKey("rocksdbSstFileSize"),
          "progress metrics are not RocksDB's — provider not in effect")
        val got = spark.table("rocks_cms")
          .select(unix_millis($"w_start"), $"cms", $"n_events")
          .as[(Long, Seq[Long], Long)].collect().toSet
        val batch = EventStreams.windowUserCms(rows.toDF(), 4, 16)
          .select(unix_millis($"w_start"), $"cms", $"n_events")
          .as[(Long, Seq[Long], Long)].collect().toSet
        assert(got == batch)
        assert(got.exists(_._2.sum > 0))
      } finally q.stop()
    }
  }

  test("ingest-time near-dup candidates on RocksDB: pairs emitted, buckets evicted") {
    withRocksDb {
      import spark.implicits._
      import graft.streaming.CorpusStreams
      import graft.streaming.CorpusStreams.{CandPair, DocInput}
      val dup = "alpha beta gamma delta epsilon zeta eta theta"
      val mem = MemoryStream[DocInput](spark)
      val q = CorpusStreams
        .streamingNearDupCands(mem.toDS(), horizonMs = 60L * 60000L)
        .writeStream.format("memory").queryName("rocks_neardup")
        .option("checkpointLocation", ckpt())
        .outputMode("append").start()
      try {
        mem.addData(DocInput(1L, ts(0), dup),
          DocInput(2L, ts(5), "unrelated words entirely different"))
        q.processAllAvailable()
        mem.addData(DocInput(3L, ts(30), dup)) // cross-batch pair w/ 1
        q.processAllAvailable()
        val pairs = spark.table("rocks_neardup").as[CandPair]
          .collect().map(p => (p.a, p.b)).toSet
        assert(pairs == Set((1L, 3L)))
        // advance the watermark far past every bucket's horizon —
        // all per-bucket state must evict
        mem.addData(DocInput(99L, ts(10000), "watermark advancer"))
        q.processAllAvailable()
        mem.addData(DocInput(98L, ts(10001), "second advancer"))
        q.processAllAvailable()
        val left = q.lastProgress.stateOperators.head.numRowsTotal
        // only the advancers' own fresh buckets may remain
        assert(left <= 8, s"expired buckets not evicted: $left")
      } finally q.stop()
    }
  }
}

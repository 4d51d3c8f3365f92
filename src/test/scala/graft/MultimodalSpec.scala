package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing: header round-trip through the batch decode
  * path, metadata-only resize, frame sampling arithmetic, and entropy
  * on known byte distributions.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def demoDocs = {
    import spark.implicits._
    Seq((0L, "aaaabbbb"), (1L, "hello world, this is a longer text"),
      (2L, "x"), (3L, "zzzz"))
      .toDF("doc_id", "text")
  }

  test("decode round-trips the packed header dimensions") {
    val assets = Multimodal.demoAssets(demoDocs, "doc_id", "text")
    val feats = Multimodal.decodeStub(assets).collect()
      .map(f => f.asset_id -> f).toMap
    // width/height formula: 16 + len%64, 16 + (len/3)%64
    assert(feats(0L).width === 16 + 8 && feats(0L).height === 16 + 2)
    assert(feats(0L).bytes === 13 + 8) // header + body
    // "aaaabbbb": two symbols, equal counts → entropy exactly 1 bit
    assert(math.abs(feats(0L).entropy - 1.0) < 1e-12)
    // single byte → entropy 0
    assert(feats(2L).entropy === 0.0)
  }

  test("resize rewrites metadata only; payload untouched") {
    val assets = Multimodal.demoAssets(demoDocs, "doc_id", "text")
    val before = assets.collect().map(a => a.asset_id ->
      a.payload.toSeq).toMap
    val resized = Multimodal.resizeStub(assets, 224, 224).collect()
    resized.foreach { a =>
      assert(a.meta.width === 224 && a.meta.height === 224)
      assert(a.payload.toSeq == before(a.asset_id))
    }
  }

  test("frameSample: one row per everyMs step, inclusive of 0") {
    val assets = Multimodal.demoAssets(demoDocs, "doc_id", "text").toDF()
    val frames = Multimodal.frameSample(assets, everyMs = 100L)
    // only video assets (id % 3 == 2): ids 2 (body 1B → 10ms) and
    // doc 2 text "x" → duration 10ms → frames at ts 0 only.
    val byId = frames.collect().groupBy(_.getLong(0))
    assert(byId.keySet === Set(2L))
    assert(byId(2L).map(_.getLong(2)).toSeq.sorted == Seq(0L))
  }
}

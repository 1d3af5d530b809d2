package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extra.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val assets = Multimodal.assets(spark, sfDir)

  test("assets carry valid fake headers and binary payloads") {
    val d = Multimodal.decode(spark, assets).collect()
    assert(d.length === 500)
    assert(d.forall(_.valid))
    assert(d.forall(r => r.width >= 16 && r.height >= 16))
  }

  test("corrupt payload decodes as invalid, not as a crash") {
    val bad = Seq(Multimodal.Asset(1L, "image", Array[Byte](1, 2, 3))).toDS()
    val d = Multimodal.decode(spark, bad).collect()
    assert(d.length === 1 && !d.head.valid)
  }

  test("features are deterministic, fixed-dim, batch-shaped") {
    val f1 = Multimodal.features(spark, assets, dim = 16).collect().sortBy(_.asset_id)
    val f2 = Multimodal.features(spark, assets.repartition(13), dim = 16)
      .collect().sortBy(_.asset_id)
    assert(f1.length === 500)
    assert(f1.forall(_.embedding.length === 16))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.asset_id == b.asset_id && a.embedding.sameElements(b.embedding)
    })
  }

  test("frame sampling respects stride/length/cap") {
    val fr = Multimodal.frameSample(spark, assets, frameLen = 16, stride = 64, maxFrames = 4)
      .collect()
    assert(fr.forall(f => f.n_frames <= 4))
    assert(fr.forall(f => f.frames.forall(_.length == 16)))
    assert(fr.exists(_.n_frames > 0))
  }

  test("resize: integer box-fit preserves aspect binding, re-encode round-trips") {
    val r = Multimodal.resize(spark, assets, maxW = 32, maxH = 32).collect()
    assert(r.length === 500)
    r.foreach { x =>
      assert(x.out_width <= 32 && x.out_height <= 32, s"${x.asset_id} exceeds box")
      assert(x.out_width >= 1 && x.out_height >= 1)
      // within-box inputs pass through untouched
      if (x.width <= 32 && x.height <= 32) {
        assert(x.out_width === x.width && x.out_height === x.height)
      } else {
        // the binding dimension hits the box exactly
        assert(x.out_width === 32 || x.out_height === 32)
        // aspect never inverts: the wider input stays the wider output
        if (x.width > x.height) assert(x.out_width >= x.out_height)
        if (x.height > x.width) assert(x.out_height >= x.out_width)
      }
      assert(x.n_bytes_out === 12L + x.out_width * x.out_height)
      // the fake re-encode must itself decode to the output dims
      assert(Multimodal.FakeCodec.decode(x.payload).contains((x.out_width, x.out_height)))
    }
    // the corpus exercises both pass-through and both binding branches
    assert(r.exists(x => x.width <= 32 && x.height <= 32))
    assert(r.exists(x => x.width > 32 && x.width >= x.height))
    assert(r.exists(x => x.height > 32 && x.height > x.width))
  }

  test("payload-aware repartition yields the requested granularity") {
    val total = assets.collect().map(_.payload.length.toLong).sum
    val rep = Multimodal.repartitionByPayload(assets, total, bytesPerPartition = total / 7)
    assert(rep.rdd.getNumPartitions === 7)
  }
}

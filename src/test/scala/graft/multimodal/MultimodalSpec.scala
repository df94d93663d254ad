package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromDocuments(spark,
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("assetsFromDocuments: binary payload + rotating mime") {
    val rows = assets.limit(6).collect()
    assert(rows.forall(_.media.nonEmpty))
    assert(rows.map(_.mime).toSet.subsetOf(
      Set("image/png", "audio/wav", "video/mp4")))
    // mime assignment is keyed by id, deterministic
    val again = assets.limit(6).collect()
    assert(rows.map(r => r.asset_id -> r.mime).toMap ==
      again.map(r => r.asset_id -> r.mime).toMap)
  }

  test("decode: deterministic metadata; images single-frame, videos multi") {
    val d = Multimodal.decode(assets).collect()
    assert(d.length == 500)
    assert(d.forall(x => x.width >= 64 && x.height >= 64))
    assert(d.filter(_.mime == "image/png").forall(_.n_frames == 1))
    assert(d.filter(_.mime == "image/png").forall(_.duration_ms == 0))
    assert(d.filter(_.mime == "video/mp4").exists(_.n_frames > 1))
  }

  test("extractFeatures: unit-normalized, stable across batch sizes") {
    val f8 = Multimodal.extractFeatures(assets, dim = 16, batchSize = 8)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    val f64 = Multimodal.extractFeatures(assets, dim = 16, batchSize = 64)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(f8 == f64) // batch shape must not change results
    val norms = f8.values.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
  }

  test("sampleFrames: ≤n frames per asset, fan-out rows keyed by asset") {
    val frames = Multimodal.sampleFrames(assets, n = 4)
    val perAsset = frames.groupByKey(_.asset_id).count().collect().toMap
    assert(perAsset.values.max <= 4)
    assert(frames.collect().forall(_.frame.length == 8))
    // every asset yields at least one frame
    assert(perAsset.size == 500)
  }

  test("feature output joins back into relational/ANN pipeline") {
    val feats = Multimodal.extractFeatures(assets, dim = 16).toDF()
    val joined = feats.join(assets.toDF(), "asset_id")
    assert(joined.count() == 500)
    import graft.functions.GraftExpressions.cosine_sim
    val self = joined.select(cosine_sim(col("features"), col("features")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-6)
  }

  test("averageHash: aHash bit rule, and k cell flips move ≤ k bits") {
    // flat grid: nothing strictly above the mean → hash 0
    assert(Multimodal.averageHash(Array.fill(64)(10)) === 0L)
    // one bright pixel above an otherwise-flat grid → exactly that bit
    val g = Array.fill(64)(10); g(5) = 200
    assert(java.lang.Long.bitCount(Multimodal.averageHash(g)) === 1)
    // the banding soundness property: flipping k cells across the (stable)
    // mean changes ≤ k hash bits
    val base = Array.tabulate(64)(i => if (i < 32) 0 else 255)
    val tweaked = base.clone(); tweaked(0) = 255; tweaked(63) = 0
    val d = java.lang.Long.bitCount(
      Multimodal.averageHash(base) ^ Multimodal.averageHash(tweaked))
    assert(d <= 2, s"2 cell flips moved $d bits")
    intercept[IllegalArgumentException] { Multimodal.averageHash(Array(1, 2)) }
  }

  test("imageNearDups: byte-identical assets pair at hamming 0, deterministic") {
    // plant two byte-level duplicates among distinct payloads
    val planted = spark.createDataset(Seq(
      Asset(1L, "same-bytes".getBytes, "image/png"),
      Asset(2L, "same-bytes".getBytes, "image/png"),
      Asset(3L, "other".getBytes, "image/png"),
      Asset(4L, "another".getBytes, "image/png")))
    val pairs = Multimodal.imageNearDups(planted, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L && p._3 == 0))
    // corpus-scale run with planted byte-duplicates (the corpus itself has
    // no byte-identical texts): every plant pairs with its source at
    // hamming 0, and the run is reproducible end-to-end
    val planted2 = assets.filter(_.asset_id < 20)
      .map(a => a.copy(asset_id = a.asset_id + 10000000L))
    val corpus = assets.unionByName(planted2)
    val a = Multimodal.imageNearDups(corpus).collect().map(_.toSeq).toSet
    val b = Multimodal.imageNearDups(corpus).collect().map(_.toSeq).toSet
    assert(a == b)
    val zeroPairs = a.filter(_(2) == 0)
    assert((0L until 20L).forall(i =>
      zeroPairs.exists(p => p(0) == i && p(1) == i + 10000000L)))
  }
}

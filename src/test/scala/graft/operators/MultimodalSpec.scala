package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** The REAL image codec path (javax.imageio): decode, luminance-histogram
  * features, and thumbnail resize — driven both directly and through the
  * Spark operators, with synthetic PNGs generated in-test.
  */
class MultimodalSpec extends AnyFunSuite {

  /** Deterministic in-memory PNG with per-pixel RGB from `f(x, y)`. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image features: real javax.imageio decode into a luminance histogram") {
    val black = Multimodal.decodeMedia(png(8, 8)((_, _) => 0x000000), "image/png", 8)
    assert(black(0) == 1.0 && black.drop(1).forall(_ == 0.0))
    val white = Multimodal.decodeMedia(png(8, 8)((_, _) => 0xffffff), "image/png", 8)
    assert(white(7) == 1.0 && white.take(7).forall(_ == 0.0))
    val gradient = png(16, 16) { (x, y) =>
      val v = (x * 16 + y) & 0xff; (v << 16) | (v << 8) | v
    }
    val g = Multimodal.decodeMedia(gradient, "image/png", 8)
    assert(math.abs(g.sum - 1.0) < 1e-9) // normalized histogram
    assert(g.count(_ > 0) > 1) // gradient spreads across buckets
  }

  test("non-image mimes and undecodable image bytes fall back to the stub") {
    val junk = Array.tabulate(100)(_.toByte)
    assert(Multimodal.decodeMedia(junk, "audio/wav", 8)
      .sameElements(Multimodal.decodeStub(junk, 8)))
    assert(Multimodal.decodeMedia(junk, "image/png", 8)
      .sameElements(Multimodal.decodeStub(junk, 8)))
  }

  test("extractFeatures routes image rows through the real decoder in Spark") {
    import spark.implicits._
    val media = Seq(
      (1L, "image/png", png(8, 8)((_, _) => 0xffffff)),
      (2L, "text/plain", "hello world".getBytes("UTF-8")))
      .toDF("media_id", "mime", "media")
    val out = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).features(7) == 1.0)
    assert(out(1L).feat_norm == 1.0)
    assert(out(2L).features
      .sameElements(Multimodal.decodeStub("hello world".getBytes("UTF-8"), 8)))
  }

  test("resizeAll produces a real deterministic thumbnail for images") {
    import spark.implicits._
    val checker = png(64, 48) { (x, y) =>
      if ((x / 8 + y / 8) % 2 == 0) 0xffffff else 0x000000
    }
    val media = Seq((1L, "image/png", checker)).toDF("media_id", "mime", "media")
    def thumb(): Array[Byte] = Multimodal.resizeAll(media, thumbW = 16, thumbH = 12)
      .collect()(0).getAs[Array[Byte]]("media")
    val t1 = thumb()
    val decoded = Multimodal.decodeImage(t1).get
    assert(decoded.getWidth == 16 && decoded.getHeight == 12)
    assert(t1.sameElements(thumb())) // byte-identical re-encode
    // the stub path still honors the bounded-size contract for other mimes
    val stubOut = Multimodal.resizeAll(
      Seq((2L, "video/mp4", Array.tabulate(999)(_.toByte))).toDF("media_id", "mime", "media"),
      targetBytes = 128).collect()(0).getAs[Array[Byte]]("media")
    assert(stubOut.length == 128)
  }

  /** 64×64 checkerboard of 8-px squares — aligned to aHash's 8×8 grid, so
    * every grid cell is uniformly black or white and single-block edits
    * have an exactly predictable Hamming effect.
    */
  private def checker(invertBlock: Option[(Int, Int)] = None): Array[Byte] =
    png(64, 64) { (x, y) =>
      val base = (x / 8 + y / 8) % 2 == 0
      val inv = invertBlock.contains((x / 8, y / 8))
      if (base ^ inv) 0xffffff else 0x000000
    }

  test("aHash64: re-encode-stable, single-block edit = Hamming 1, inverse image far") {
    def hashOf(b: Array[Byte]): Long = Multimodal.aHash64(Multimodal.decodeImage(b).get)
    val a = hashOf(checker())
    assert(a == hashOf(checker())) // byte path fully deterministic
    // decode → re-encode as PNG (lossless) → identical hash
    val reenc = Multimodal.resizeImage(checker(), 64, 64).get
    assert(java.lang.Long.bitCount(a ^ hashOf(reenc)) <= 1)
    // inverting ONE aligned 8×8 block flips exactly that cell's bit (the
    // global mean moves 1/64th — not enough to flip any other cell of a
    // saturated checkerboard)
    val oneBlock = hashOf(checker(invertBlock = Some((3, 5))))
    assert(java.lang.Long.bitCount(a ^ oneBlock) == 1)
    // the full inverse is maximally far
    val inverse = Multimodal.aHash64(Multimodal.decodeImage(
      png(64, 64)((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xffffff)).get)
    assert(java.lang.Long.bitCount(a ^ inverse) == 64)
  }

  test("perceptualHash dispatches on mime: images via aHash, others via the stub") {
    val img = checker()
    assert(Multimodal.perceptualHash(img, "image/png") ==
      Multimodal.aHash64(Multimodal.decodeImage(img).get))
    val txt = "hello world".getBytes("UTF-8")
    assert(Multimodal.perceptualHash(txt, "text/plain") == Multimodal.stubHash64(txt))
    // undecodable image bytes degrade to the stub, not an abort
    assert(Multimodal.perceptualHash(txt, "image/png") == Multimodal.stubHash64(txt))
  }

  test("stubHash64: exact dups collide, same-length edits stay local, short payloads separate by length") {
    def h(b: Array[Byte]) = Multimodal.stubHash64(b)
    val a = "payload one payload one payload one payload one payload one!!!!!!!".getBytes("UTF-8")
    assert(h(a) == h(a.clone())) // exact duplicate → Hamming 0
    // same-length single-byte edit perturbs ONLY its residue class
    val edited = a.clone(); edited(10) = (edited(10) + 2).toByte
    assert(java.lang.Long.bitCount(h(a) ^ h(edited)) <= 1)
    // short payloads of DIFFERENT lengths no longer collide near Hamming 0
    // (pre-fix: untouched residue classes all sat at parity 0, so any two
    // same-parity 1-byte payloads hashed identically)
    val d1 = java.lang.Long.bitCount(h(Array[Byte](2)) ^ h(Array[Byte](2, 4)))
    assert(d1 >= 16, s"1-byte vs 2-byte payloads landed $d1 apart")
    val d2 = java.lang.Long.bitCount(h("ab".getBytes) ^ h("abc".getBytes))
    assert(d2 >= 16, s"adjacent-length short payloads landed $d2 apart")
  }

  test("bandedHammingPairs = brute force exactly (pigeonhole recall AND precision)") {
    import spark.implicits._
    // 300 seeded hashes plus planted near-pairs at distances 0–4
    val rnd = new java.util.Random(11L)
    val base = Seq.fill(260)(rnd.nextLong())
    def flip(h: Long, k: Int): Long = {
      var out = h
      var i = 0
      while (i < k) { out ^= 1L << rnd.nextInt(64); i += 1 }
      out
    }
    val planted = Seq(flip(base(0), 0), flip(base(1), 1), flip(base(2), 2),
      flip(base(3), 3), flip(base(4), 4))
    val all = (base ++ planted).zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = all.toDF("id", "h")
    val got = Dedup.bandedHammingPairs(df, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("hamming")))
      .toSet
    val brute = (for {
      a <- all; b <- all
      if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2)
      if d <= 3
    } yield (a._1, b._1, d.toLong)).toSet
    assert(got == brute) // exact: banding loses nothing at distance ≤ 3 and adds nothing
    assert(brute.size >= 4) // the distance-0..3 plants are all present
  }

  test("clipScorePairs (q156): every score matches a driver-side recompute; keep split populated") {
    val docs = graft.Tables.documents(spark, graft.SparkTestSession.sf0001)
    val emb = graft.Tables.embeddings(spark, graft.SparkTestSession.sf0001)
    val got = Multimodal.clipScorePairs(Multimodal.mediaFromDocuments(docs), emb)
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Double]("clip_cos"), r.getAs[Long]("keep")))).toMap

    // driver-side truth from the SAME encoders: stub image features of
    // the text bytes, block-mean pooling of the 64-dim caption embedding
    val textOf = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val embOf = emb.collect().map(r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def pooled(v: Array[Double], dim: Int): Array[Double] =
      Array.tabulate(dim)(b => v.slice(b * 8, b * 8 + 8).sum / 8.0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def d(x: Array[Double], y: Array[Double]) = x.zip(y).map { case (p, q) => p * q }.sum
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val ids = textOf.keySet intersect embOf.keySet
    assert(got.keySet == ids, "one row per aligned (image, caption) pair")
    ids.foreach { id =>
      val iv = Multimodal.decodeMedia(textOf(id).getBytes("UTF-8"), "text/plain", 8)
      val c = cos(iv, pooled(embOf(id), 8))
      val (gc, keep) = got(id)
      assert(math.abs(gc - c) < 1e-6, s"pair $id: $gc vs $c")
      assert(keep == (if (c >= 0.2) 1L else 0L), s"pair $id keep flag")
    }
    // the gate must actually split the corpus (both classes present)
    val keeps = got.values.count(_._2 == 1L)
    assert(keeps > 0 && keeps < ids.size, s"degenerate keep split: $keeps/${ids.size}")
  }

  test("q149 at sf0.1 returns exactly the true byte-identical duplicate pairs") {
    // ground truth from the corpus itself: with the length-mixed stub
    // hash, the only text/plain near-dups are byte-identical payloads —
    // sf0.1 is the first scale with any (8 duplicate groups); below it
    // the correct answer is EMPTY (the pre-fix sf0.01 "pairs" were
    // short-payload hash collisions, the advisor's finding)
    import org.apache.spark.sql.functions._
    val big = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, big)
    val dupPairs = docs.select(col("doc_id"), col("text")).collect()
      .groupBy(_.getString(1)).values.filter(_.length > 1)
      .flatMap { g =>
        val ids = g.map(_.getLong(0)).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
      }.toSet
    assert(dupPairs.nonEmpty, "sf0.1 must contain byte-identical docs")
    val got = graft.queries.Registry.byName("q149_media_phash_neardup")
      .fn(spark, big).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(got.keySet == dupPairs, s"got ${got.keySet}, want $dupPairs")
    assert(got.values.forall(_ == 0L), "byte-identical payloads must hash at Hamming 0")
  }

  test("phashNearDupPairs on real images: edit-pair found, unrelated pair absent") {
    import spark.implicits._
    val media = Seq(
      (1L, "image/png", checker()),
      (2L, "image/png", checker(invertBlock = Some((0, 0)))), // Hamming 1 from #1
      (3L, "image/png", png(64, 64)((x, y) =>
        if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xffffff)), // inverse: far from both
      (4L, "text/plain", "same bytes".getBytes("UTF-8")),
      (5L, "text/plain", "same bytes".getBytes("UTF-8"))) // exact dup → stub Hamming 0
      .toDF("media_id", "mime", "media")
    val pairs = Multimodal.phashNearDupPairs(media, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(pairs((1L, 2L)) == 1L)
    assert(pairs((4L, 5L)) == 0L)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}

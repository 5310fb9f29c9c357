package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{spark, sf0001}
import graft.Tables

class OperatorsSpec extends AnyFunSuite {

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val emb  = Tables.embeddings(spark, sf0001)

  test("minhash-LSH near-dup pairs equal the exact inverted-index Jaccard pairs") {
    val exact = Dedup.shingleJaccardPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty) // sf0.001 has 28 near-dup pairs at J>=0.8
    assert(lsh == exact)   // banding at k=128/b=32 catches J>=0.8 w.p. ~1-2e-7
  }

  test("df-cap off preserves exact Jaccard; a cap only drops pairs, never invents") {
    type P = (Long, Long, Double)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[P] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs(Dedup.shingleJaccardPairs(docs, 0.8))
    // cap=None is the default: identical call path, identical answer
    assert(pairs(Dedup.shingleJaccardPairs(docs, 0.8, dfCap = None)) == exact)
    // a cap above the max document frequency filters nothing
    assert(pairs(Dedup.shingleJaccardPairs(docs, 0.8, dfCap = Some(1000000))) == exact)
    // the 100 TB configuration: a tight cap may only DROP pairs (or lower a
    // surviving pair's score — denominators stay the full set sizes), so
    // every surviving (pair, score) is bounded by an exact pair's score
    val capped = pairs(Dedup.shingleJaccardPairs(docs, 0.8, dfCap = Some(2)))
    val exactByPair = exact.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(capped.forall { case (a, b, j) =>
      exactByPair.get((a, b)).exists(j <= _)
    })
  }

  test("connected components: chains merge transitively, keepers are component minima") {
    import spark.implicits._
    // A-B-C chain (via B) + isolated D-E pair + F-G-H triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    // long chain exercises multi-round propagation (diameter 5)
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val chainGot = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainGot.values.toSet == Set(0L) && chainGot.size == 6)
  }

  test("connected components: a 200-hop chain converges in O(log d) rounds, not O(d)") {
    import spark.implicits._
    // Plain min-label propagation moves the minimum ONE hop per round, so a
    // diameter-200 chain would hit the 25-round bound and (pre-round-5)
    // silently split into multiple components — the round-4 advisor
    // finding. Pointer jumping (label := label of label) halves the
    // remaining distance per round; the same chain now converges well
    // inside the bound and every node labels back to 0.
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val result = Dedup.connectedComponents(chain)
    val got = result.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 201 && got.values.toSet == Set(0L))
    Dedup.release(result)
  }

  test("connected components: hitting the iteration bound throws, never splits silently") {
    import spark.implicits._
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("release: derived frames are a no-op, only the owned checkpoint is freed") {
    import spark.implicits._
    // release() must strip only row-preserving wrappers (the dropped
    // bookkeeping column) — a frame that merely REFERENCES the checkpoint
    // through a join must not free it: locally-checkpointed RDDs have
    // truncated lineage, so freeing a shared one breaks every other
    // frame built on it (the r7 review finding).
    def persisted(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val baseline = persisted()
    val comps = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b"))
    comps.write.format("noop").mode("overwrite").save()
    val withKeep = comps.join(
      comps.groupBy(col("component")).agg(min(col("doc_id")).as("rep")), "component")
    Dedup.release(withKeep) // join root: must NOT free the shared checkpoint
    assert(persisted() != baseline, "derived release freed the shared checkpoint")
    assert(withKeep.count() == 5) // checkpoint still readable through the join
    Dedup.release(comps) // projection over the checkpoint: frees it
    assert(persisted() == baseline,
      s"owned release missed blocks: ${(persisted() -- baseline).mkString(",")}")
  }

  test("connected components: no net block-manager growth across back-to-back runs") {
    import spark.implicits._
    // Round-4 verdict #3: every round's localCheckpoint (edges, labels,
    // each iteration's next) was parked in executor storage forever; two
    // q88-style runs stacked residue the driver-side bench paid for. Now
    // superseded checkpoints are released per round and edges on exit, so
    // after materialize + release the persistent-RDD set returns to its
    // baseline.
    def persisted(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val baseline = persisted()
    for (_ <- 1 to 2) {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
        .toDF("doc_a", "doc_b")
      val comps = Dedup.connectedComponents(pairs)
      comps.write.format("noop").mode("overwrite").save() // materialize
      Dedup.release(comps)
      assert(persisted() == baseline,
        s"leaked persistent RDDs: ${(persisted() -- baseline).mkString(",")}")
    }
  }

  test("hashPartitionedLocalCheckpoint: declared partitioning makes co-keyed joins exchange-free") {
    import spark.implicits._
    // The mechanism behind the components co-partitioned path: a plain
    // localCheckpoint under AQE records UnknownPartitioning, so joins over
    // it re-shuffle both sides every time. The bridge helper pins a
    // truthful HashPartitioning (REPARTITION_BY_NUM is never altered by
    // AQE) on the LogicalRDD; with broadcast off, a join on the pinned
    // keys — including through a rename — must plan ZERO shuffle
    // exchanges.
    val bridge = org.apache.spark.sql.graft.bridge
    val was = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val np = spark.sessionState.conf.numShufflePartitions
      val a = bridge.hashPartitionedLocalCheckpoint(
        (0L until 1000L).map(i => (i, i % 97)).toDF("u", "v"), np, "v")
      val b = bridge.hashPartitionedLocalCheckpoint(
        (0L until 97L).map(i => (i, i * 2)).toDF("doc_id", "component"),
        np, "doc_id")
      val j = a.join(b.select(col("doc_id").as("v"), col("component")), "v")
      j.write.format("noop").mode("overwrite").save()
      val exec = j.queryExecution.executedPlan.toString
      assert(!exec.contains("Exchange hashpartitioning"),
        s"co-keyed join over pinned checkpoints still shuffles:\n$exec")
      assert(j.count() == 1000)
      Dedup.release(a)
      Dedup.release(b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", was)
  }

  test("coPartitionAuto: pins when labels exceed the threshold AND when broadcast is disabled") {
    // threshold = -1 (broadcast disabled) is the one configuration where
    // labels can NEVER broadcast — auto must pin regardless of size (the
    // r8 review caught the original form picking the plain path there)
    assert(Dedup.coPartitionAuto(-1L, 10L))
    assert(Dedup.coPartitionAuto(-1L, 10000000L))
    // sized decision: pin only when the 16 B/row label frame outgrows it
    assert(!Dedup.coPartitionAuto(10L * 1024 * 1024, 1000L))
    assert(Dedup.coPartitionAuto(10L * 1024 * 1024, 1000000L))
    // boundary: exactly at the threshold stays plain
    assert(!Dedup.coPartitionAuto(16000L, 1000L))
    assert(Dedup.coPartitionAuto(15999L, 1000L))
  }

  test("connected components: forced co-partitioned path matches, releases, and skips labels-side shuffles") {
    import spark.implicits._
    def persisted(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val ref = Dedup.connectedComponents(pairs) // auto → plain path at this size
    val expected = ref.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.release(ref)
    val baseline = persisted()
    spark.conf.set("spark.graft.components.copartition", "on")
    try {
      val comps = Dedup.connectedComponents(pairs)
      val got = comps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, "co-partitioned labeling diverged from plain path")
      Dedup.release(comps)
      assert(persisted() == baseline,
        s"co-partitioned path leaked blocks: ${(persisted() -- baseline).mkString(",")}")
    } finally spark.conf.unset("spark.graft.components.copartition")
  }

  test("giant-component demotion: labeling identical when the skew probe trips mid-run") {
    import spark.implicits._
    // long chain (needs >1 round) + a star welded to its head: the star's
    // hub label dominates, so a probe at round 1 sees maxFreq >> 5% and
    // demotes the remaining rounds to plain checkpoints — the labeling
    // must be identical to the default run either way
    val star = (1L to 60L).map(i => (0L, i))
    val chain = (100L to 140L).map(i => (i, i + 1))
    val weld = Seq((0L, 100L))
    val pairs = (star ++ chain ++ weld).toDF("doc_a", "doc_b")
    val expected = {
      val ref = Dedup.connectedComponents(pairs)
      val m = ref.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Dedup.release(ref); m
    }
    assert(expected.values.toSet == Set(0L), "one welded component labeled 0")
    spark.conf.set("spark.graft.components.copartition", "on")
    spark.conf.set("spark.graft.components.skewProbeRound", "1")
    try {
      var rounds = 0
      val comps = Dedup.connectedComponents(pairs, roundProbe = r => rounds = r)
      val got = comps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Dedup.release(comps)
      assert(rounds > 1, "graph must take >1 round or the probe never fires")
      assert(got == expected, "demoted run diverged from the default labeling")
    } finally {
      spark.conf.unset("spark.graft.components.copartition")
      spark.conf.unset("spark.graft.components.skewProbeRound")
    }
  }

  test("connected components match a union-find reference on random graphs") {
    import spark.implicits._
    // seeded random edge sets vs a driver-side union-find (path compression)
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 5) {
      val nNodes = 30
      val edges = Seq.fill(25)((rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("simhash pairs: near-dup docs collide, fingerprints differ for distinct docs") {
    val sims = Dedup.withSimhash(docs).select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims.values.toSet.size > 400) // distinct docs get distinct-ish fingerprints
    val exactPairs = Dedup.shingleJaccardPairs(docs, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hammingOf = exactPairs.map { case (a, b) =>
      java.lang.Long.bitCount(sims(a) ^ sims(b))
    }
    // J>=0.95 word-level near-dups are within a few bits in simhash space
    assert(hammingOf.nonEmpty && hammingOf.forall(_ <= 8))
    val banded = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // band scheme is exact for hamming<=3: must contain every such pair
    val within3 = exactPairs.filter { case (a, b) =>
      java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
    }.toSet
    assert(within3.subsetOf(banded))
  }

  test("ANN top-k recall vs brute force is usable and candidates are a strict subset") {
    val exact = graft.queries.Registry.byName("q29_cosine_topk")
      .fn(spark, sf0001).collect().map(_.getLong(0)).toSet
    val ann = Similarity.annTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    assert(ann.size == 10)
    val recall = (ann intersect exact).size / 10.0
    assert(recall >= 0.7, s"ANN recall too low: $recall") // 32 tables x 6 bits x 3 probes (r14 multi-probe floor)
  }

  test("LSH near-dup pairs are a high-recall subset of brute-force pairs at the threshold") {
    import org.apache.spark.sql.functions._
    val brute = Similarity.topKPairs(emb, k = 500)
      .filter(col("cos_sim") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.nearDupPairsLsh(emb, minCos = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh.subsetOf(brute)) // exact cosine filter → no false positives
    val recall = (lsh intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH near-dup recall too low: $recall")
  }

  test("IVF top-k: valid results with usable recall; probing fewer lists than exist") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    // 5-query MEAN recall (RecallProbe's methodology): single-query recall
    // on a 10-element set is too coarse a sample to pin a meaningful floor
    val recalls = Seq(0L, 1L, 2L, 3L, 4L).map { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select(asDouble(col("embedding")).as("qv"))
      val exact = emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .join(broadcast(qv))
        .withColumn("c", cosine(col("v"), col("qv")))
        .orderBy(col("c").desc, col("vec_id"))
        .limit(10).collect().map(_.getLong(0)).toSet
      val ivf = Similarity.ivfTopK(emb, qid, 10).collect().map(_.getLong(0)).toSet
      assert(ivf.size == 10)
      assert(!ivf.contains(qid))
      (ivf intersect exact).size / 10.0
    }
    val recall = recalls.sum / recalls.size
    // learned lists (2 Lloyd iters) + 6/16 probed
    assert(recall >= 0.6, s"IVF mean recall too low: $recall ($recalls)")
  }

  test("frame sampling emits every stride-th fixed-size chunk; resize bounds payloads") {
    val media = Multimodal.mediaFromDocuments(docs)
    val frames = Multimodal.sampleFrames(media, frameSize = 64, stride = 2)
    val byDoc = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lens = docs.select(col("doc_id"), length(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (id, n) =>
      val chunks = (lens(id) + 63) / 64
      assert(n == (chunks + 1) / 2, s"doc $id: $n frames for ${lens(id)} bytes")
    }
    val resized = Multimodal.resizeAll(media, targetBytes = 128)
    val sizes = resized.select(octet_length(col("media"))).distinct().collect()
    assert(sizes.map(_.getInt(0)).toSeq == Seq(128))
  }

  test("language ID identifies hand-written multilingual samples") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and it is a good day for the park"),
      (2L, "el perro esta en la casa y los gatos son de la calle"),
      (3L, "le chien est dans la maison et les chats sont de la rue"),
      (4L, "der hund ist in den haus und die katzen sind von der strasse"),
      (5L, "xyzzy qwerty asdf")).toDF("doc_id", "text")
    val got = TextAnalysis.withLangId(samples)
      .select("doc_id", "predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(2L) == "es")
    assert(got(3L) == "fr"); assert(got(4L) == "de")
    assert(got(5L) == "und")
  }

  test("short docs survive ANSI mode: empty bigrams/sketch instead of out-of-bounds") {
    import spark.implicits._
    // Spark 4 defaults spark.sql.ansi.enabled=true, where an unguarded
    // element_at past the array end aborts the query — pin that the token
    // windows are guarded for docs shorter than the window
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val short = Seq((1L, "one"), (2L, "two tokens"), (3L, "a b c d e f")).toDF("doc_id", "text")
    val (n2, dup) = TextAnalysis.bigramStats(col("text"))
    val bi = short.select(col("doc_id"), n2.as("n"), dup.as("d")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bi(1L) == (0L, 0L)) // single token: zero bigrams, no crash
    assert(bi(2L) == (1L, 0L))
    assert(bi(3L) == (5L, 0L))
    val sk = TextAnalysis.withSketch(short, n = 4, k = 8)
      .select(col("doc_id"), size(col("sketch")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sk(1L) == 0) // below the 4-gram window: empty sketch
    assert(sk(2L) == 0)
    assert(sk(3L) == 3) // 6 tokens -> 3 distinct 4-gram hashes
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
  }

  test("multimodal feature extraction: batch shape, determinism, byte counts") {
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.features.length == 8))
    val byId = feats.map(f => f.media_id -> f).toMap
    val expected = docs.select(col("doc_id"), length(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(byId.forall { case (id, f) => f.n_bytes == expected(id) })
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.feat_norm).toMap
    assert(byId.forall { case (id, f) => again(id) == f.feat_norm })
  }

  test("repartitionByBytes sizes partitions by payload, not row count") {
    val media = Multimodal.mediaFromDocuments(docs)
    val out = Multimodal.repartitionByBytes(media, totalBytes = 1L << 22, targetBytes = 1L << 20)
    assert(out.rdd.getNumPartitions == 4)
  }

  test("incremental dedup: hand-built delta fires exact / batch / near signals correctly") {
    import graft.SparkTestSession.spark.implicits._
    val twenty = (1 to 20).map(i => s"t$i").mkString(" ")
    // 19 tokens shared with `twenty`, last token differs: 18 3-gram shingles
    // each, 17 common -> J = 17/19 ≈ 0.895 >= 0.8
    val nearTwin = (1 to 19).map(i => s"t$i").mkString(" ") + " zz"
    val corpus = Seq(
      (1L, twenty),
      (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, twenty),                         // exact corpus dup (and J=1 near)
      (11L, nearTwin),                       // near-dup of corpus 1, not exact
      (12L, "completely different words entirely unrelated"), // clean
      (13L, twenty),                         // batch dup of 10 + exact dup of 1
      (14L, "x y z")).toDF("doc_id", "text") // too short to shingle-match, clean
    val got = Dedup.incrementalDedup(incoming, corpus, threshold = 0.8)
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4)))).toMap
    assert(got(10L) == ((Some(1L), None, Some(1L), 0L)))
    assert(got(11L) == ((None, None, Some(1L), 0L)))
    assert(got(12L) == ((None, None, None, 1L)))
    assert(got(13L) == ((Some(1L), Some(10L), Some(1L), 0L)))
    assert(got(14L) == ((None, None, None, 1L)))
    // df-cap only ever clears signals, never invents them
    val capped = Dedup.incrementalDedup(incoming, corpus, threshold = 0.8,
      dfCap = Some(1)).collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(capped.forall { case (id, nd) => nd.isEmpty || nd == got(id)._3 })
  }

  test("withScopedBlocks releases the scope's checkpoint blocks after the terminal action, leaving pre-existing blocks alone") {
    val emb = graft.Tables.embeddings(graft.SparkTestSession.spark,
      graft.SparkTestSession.sf0001)
    val spark = emb.sparkSession
    // a PRE-EXISTING block the scope must NOT touch
    val outside = emb.select(col("vec_id")).localCheckpoint(true)
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val rows = Similarity.withScopedBlocks(spark) {
      val r = Similarity.nearDupPairsLsh(emb, minCos = 0.35).collect()
      // the lshScoredPairs projection checkpointed INSIDE the scope
      assert(spark.sparkContext.getPersistentRDDs.keySet.size > baseline.size)
      r
    }
    assert(rows.nonEmpty)
    // scope exit freed exactly the blocks the call parked
    assert(spark.sparkContext.getPersistentRDDs.keySet == baseline)
    assert(outside.count() > 0) // pre-existing block still readable
    Dedup.release(outside)
  }
}

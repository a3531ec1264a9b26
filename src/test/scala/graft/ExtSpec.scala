package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextOps}
import graft.model.MediaAsset

/** Semantics checks for the LLM-pipeline extension operators on tiny
  * hand-built frames (the sf-scale correctness is covered by the
  * DuckDB oracle; these pin the behavioral contracts). */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(docs).orderBy(col("keeper"))
      .select(col("n_copies"), col("keeper")).as[(Long, Long)].collect().toSeq
    assert(g === Seq((2L, 1L), (1L, 3L)))
  }

  test("dedup apply keeps exactly one keeper per duplicate group") {
    // the gate fixture has no exact duplicates, so the keeper-selection
    // path must be pinned here with planted ones
    val docs = Seq(
      (5L, "Same   Content here"), // normalizes equal to doc 2
      (2L, "same content HERE"),
      (9L, "unique one")).toDF("doc_id", "text")
    val norm = docs.withColumn("text",
      org.apache.spark.sql.functions.regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val keepers = Dedup.exactGroups(norm).select(col("keeper"))
      .as[Long].collect().sorted.toSeq
    assert(keepers === Seq(2L, 9L), "min doc_id survives; the other copy is dropped")
  }

  test("jaccard finds the planted near-duplicate pair only") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words entirely here now")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.4, Dedup.DfCap.ExhaustiveOracle)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L)))
  }

  test("minhash LSH surfaces near-dups as candidate pairs") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatures(docs, 3, 16), 4, 4)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSeq
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)) && !cands.contains((2L, 3L)))
  }

  test("MinHashSketch aggregate equals the composed per-permutation min form") {
    val docs = Seq(
      (1L, "one two three four five six seven"),
      (2L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(docs, 3)
    val viaSketch = Dedup.minhashSignatures(docs, 3, 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val mins = (0 until 8).map { i =>
      min(pmod(col("h") * (2L * i + 1) + (10007L * i + 1), lit(Dedup.P))).as(s"mh$i")
    }
    val composed = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaSketch === composed)
  }

  test("df cap drops hot-shingle pairs and keeps true duplicates") {
    // 6 docs share ONE ubiquitous shingle (df=6 > cap 5) and nothing
    // else; 2 docs are true duplicates whose shingles are rare.
    val hot = (1L to 6L).map(i => (i, s"hot shin gle u${i}a u${i}b u${i}c"))
    val dups = Seq((100L, "dup one two three"), (101L, "dup one two three"))
    val docs = (hot ++ dups).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, 3, 0.0, Dedup.DfCap.ExhaustiveOracle)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, 3, 0.0, Dedup.DfCap.Capped(5L))
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    // uncapped: the hot shingle alone manufactures all 15 cross-pairs
    assert(uncapped.contains((1L, 2L)) && uncapped.size === 16)
    // capped: hot-shingle-only pairs are gone, the real duplicate stays
    assert(capped === Set((100L, 101L)))
  }

  test("pigeonhole-banded simhash pairs exactly equal the exhaustive form") {
    // real corpus: 500 docs → 124 750 exhaustive pairs checked against
    // the banded join (the guaranteed-recall claim, not a sample)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fps = Dedup.simhash(docs, 32)
    val banded = Dedup.simhashPairs(fps, 3, 32)
      .as[(Long, Long, Int)].collect().toSet
    val exhaustive = Dedup.simhashPairsExhaustive(fps, 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded === exhaustive)
    assert(exhaustive.nonEmpty, "fixture must actually contain close pairs")
  }

  test("redaction scrubs planted emails and urls, counts hits, leaves clean text alone") {
    val docs = Seq(
      (1L, "contact alice.smith+x@example.org or https://example.com/a?b=1 thanks"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextOps.redact(col("text")),
        TextOps.redactionCount(col("text")))
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ("contact <EMAIL> or <URL> thanks", 2))
    assert(out(2L) === ("no pii here at all", 0))
  }

  test("hash-split sampling is deterministic, nested, and approximately stratified") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def sample(pct: Int): Set[Long] =
      docs.filter(TextOps.hashSample(col("lang"), col("doc_id"), pct))
        .select(col("doc_id")).as[Long].collect().toSet
    val s20a = sample(20); val s20b = sample(20)
    assert(s20a === s20b, "same rows on every run")
    assert(sample(10).subsetOf(s20a), "smaller rates are nested inside larger ones")
    val rate = s20a.size.toDouble / docs.count()
    assert(rate > 0.1 && rate < 0.3, s"overall rate ~20%, got $rate")
  }

  test("near-dup components collapse transitive chains to the min-id keeper") {
    // chain 1-2-3 (1,3 never paired directly), pair 4-5, singleton 6,
    // and a diameter-4 chain 10..14 to force several propagation sweeps
    val docs = (Seq(1L, 2L, 3L, 4L, 5L, 6L) ++ (10L to 14L)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L)
    // driver union-find fast path (default threshold)
    val viaDriver = Dedup.nearDupComponents(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver === expected)
    // distributed label-propagation path (threshold forced to 0)
    val viaLoop = Dedup.nearDupComponents(docs, pairs, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaLoop === expected)
  }

  test("weighted-sample key is deterministic and weight-monotone") {
    // same id + larger weight ⇒ strictly larger key (u^(1/w) rises in
    // w for u<1), so inclusion odds grow with weight; and the key is a
    // pure function of (id, weight) — stable across runs
    val rows = (1L to 50L).map(i => (i, 10L + i, 1000L + i))
      .toDF("doc_id", "w_small", "w_big")
    val keyed = rows.select(
      TextOps.weightedSampleKey(col("doc_id"), col("w_small")).as("ks"),
      TextOps.weightedSampleKey(col("doc_id"), col("w_big")).as("kb"))
      .as[(Double, Double)].collect()
    assert(keyed.forall { case (ks, kb) => ks > 0.0 && kb < 1.0 && ks < kb })
    val again = rows.select(
      TextOps.weightedSampleKey(col("doc_id"), col("w_small")).as("ks"))
      .as[Double].collect()
    assert(again.toSeq === keyed.map(_._1).toSeq)
  }

  test("near-dup apply keeps one representative per component plus singletons") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val keep = Dedup.nearDupComponents(docs, pairs)
      .filter(col("doc_id") === col("group_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(keep === Set(1L, 4L, 5L))
  }

  test("two-phase sequence packing equals the naive global cumsum") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = TextOps.packSequences(docs, 2048L, 100L)
      .select(col("doc_id"), col("tok_start"), col("chunk_id"))
      .as[(Long, Long, Long)].collect().toSet
    val naive = docs
      .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("tok_start", sum(col("n_tok")).over(Window.orderBy(col("doc_id"))) - col("n_tok"))
      .select(col("doc_id"), col("tok_start"),
        (col("tok_start") / 2048L).cast("long").as("chunk_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(packed === naive)
    assert(packed.map(_._3).size > 1, "fixture must span several chunks")
  }

  test("contamination pairs cross the split boundary by construction") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val marks = docs.select(col("doc_id"),
      TextOps.hashSample(col("lang"), col("doc_id"), 20).as("is_eval"))
      .as[(Long, Boolean)].collect().toMap
    val rows = SparkEntry.queries("d_contamination")(spark, "/root/testdata/sf0.001")
      .select(col("doc_a"), col("doc_b"), col("eval_doc"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (a, b, e) =>
      assert(marks(a) ^ marks(b), s"pair ($a,$b) must cross the split")
      assert(e === (if (marks(a)) a else b), "eval_doc must be the eval-side id")
    }
  }

  test("simhash of near-identical docs is close in Hamming distance") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w13"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12")).toDF("doc_id", "text")
    val fp = Dedup.simhash(docs, 32).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
  }

  test("brute-force top-k ranks an identical vector first") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0), (10L, Array(1f, 0f, 0f), 0),
      (11L, Array(0.9f, 0.1f, 0f), 0), (12L, Array(0f, 1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(emb, col("vec_id") < 8, 2)
      .orderBy(col("rnk")).select(col("neighbor_id"), col("cos"))
      .as[(Long, Double)].collect().toSeq
    assert(top.map(_._1) === Seq(10L, 11L))
    assert(top.head._2 === 1.0)
  }

  test("LSH ANN only searches the query's bucket") {
    val emb = Seq(
      (0L, Array(1f, 1f, 1f), 0),   // bucket 0b111
      (10L, Array(2f, 1f, 1f), 0),  // same bucket
      (11L, Array(-1f, 1f, 1f), 0)) // different bucket: excluded
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.lshTopK(emb, col("vec_id") < 8, 5, 3)
      .select(col("neighbor_id")).as[Long].collect().toSeq
    assert(got === Seq(10L))
  }

  test("multi-probe ANN recall is at least single-probe and measurably improves") {
    // recall measured against the exact brute-force top-3 on the real
    // sf0.001 embeddings (8 queries × 492 candidates)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pred = col("vec_id") < 8
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("q_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    val brute = hits(Similarity.bruteForceTopK(emb, pred, 3))
    def recall(s: Set[(Long, Long)]): Double =
      (s intersect brute).size.toDouble / brute.size
    val lsh1 = recall(hits(Similarity.lshTopK(emb, pred, 3, 8)))
    val lshM = recall(hits(Similarity.lshTopKMulti(emb, pred, 3, 8)))
    val ivf1 = recall(hits(Similarity.ivfTopK(emb, pred, 3, 8)))
    val ivfM = recall(hits(Similarity.ivfTopKMulti(emb, pred, 3, 8, 2)))
    assert(lshM >= lsh1 && ivfM >= ivf1, s"multi-probe must not lose recall (lsh $lsh1->$lshM, ivf $ivf1->$ivfM)")
    assert(lshM + ivfM > lsh1 + ivf1, s"multi-probe must measurably improve on the fixture (lsh $lsh1->$lshM, ivf $ivf1->$ivfM)")
  }

  test("k-means refinement does not degrade the within-cell cosine objective") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def objective(iters: Int): Double =
      Similarity.ivfAssignCodebook(emb, Similarity.kmeansCodebook(emb, 8, 64, iters))
        .agg(avg(col("cell_cos"))).head().getDouble(0)
    val before = objective(0) // iters=0 == the hash-sample codebook
    val after = objective(2)
    assert(after >= before - 1e-9,
      s"Lloyd iterations must not degrade the spherical objective: $before -> $after")
  }

  test("zero-norm vectors assign to the smallest-c_id cell, matching the oracle's NaN rule") {
    // a zero embedding yields NaN cosine to every centroid; both the
    // oracle window (NaN sorts greatest, tiebreak c_id) and the
    // engine's fold (Spark comparisons treat NaN as largest) must land
    // it in the smallest-c_id cell — never a sentinel cell
    val emb = ((0L to 9L).map(i => (i, Array.fill(4)(i.toFloat + 1f), 0)) :+
      ((99L, Array.fill(4)(0f), 0))).toDF("vec_id", "embedding", "label")
    val assigned = Similarity.ivfAssign(emb, 2)
    assert(assigned.filter(col("cell") === -1L).count() === 0, "sentinel cell must never appear")
    val zeroCell = assigned.filter(col("vec_id") === 99L).select(col("cell")).as[Long].head()
    val cids = Similarity.kmeansCodebook(emb, 2, 4, 0)
      .select(explode(col("cents")).as("c")).select(col("c.c_id")).as[Long].collect()
    assert(zeroCell === cids.min)
  }

  test("PQ reconstruction is exact for seed vectors and lossy-but-finite for the rest") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val enc = Similarity.pqReconstruct(emb, 4, 8, 64)
      .withColumn("err", Similarity.dot(
        org.apache.spark.sql.functions.zip_with(col("v"), col("recon"), (x, y) => x - y),
        org.apache.spark.sql.functions.zip_with(col("v"), col("recon"), (x, y) => x - y)))
    // the 4 codebook seeds reconstruct to themselves: error exactly 0
    assert(enc.filter(col("err") === 0.0d).count() === 4)
    // everything else has finite, positive quantization error
    val bad = enc.filter(col("err").isNull || col("err") < 0.0d ||
      org.apache.spark.sql.functions.isnan(col("err"))).count()
    assert(bad === 0)
  }

  test("PQ tolerates degenerate vectors: NaN dims take the first codeword, never crash") {
    val emb = ((1L to 6L).map(i => (i, Array.fill(8)(i.toFloat), 0)) :+
      ((99L, Array(Float.NaN, 1f, 1f, 1f, 1f, 1f, 1f, 1f), 0)))
      .toDF("vec_id", "embedding", "label")
    val enc = Similarity.pqReconstruct(emb, 2, 2, 8)
    // the NaN vector's first subspace distance is NaN for every
    // codeword: the fold keeps code 0 and reconstruction stays valid
    val codes = enc.filter(col("vec_id") === 99L)
      .select(col("codes")).as[Seq[Int]].head()
    assert(codes.head === 0)
    assert(enc.count() === 7, "every vector, degenerate or not, must encode")
  }

  test("IVF assignment uses exactly the fixed-k codebook") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val assigned = Similarity.ivfAssign(emb, 8)
    assert(assigned.count() === emb.count(), "every vector gets a cell")
    val cells = assigned.select(countDistinct(col("cell"))).as[Long].head()
    assert(cells <= 8 && cells > 1, s"cells must come from the k=8 codebook, got $cells")
  }

  test("extracted media features flow into the ANN path end-to-end") {
    val assets = Multimodal.toAssets(
      Seq((0L, "aaaa bbbb cccc".getBytes),
          (10L, "aaaa bbbb cccd".getBytes),
          (11L, "zzzz yyyy xxxx qqqq".getBytes)).toDF("asset_id", "payload"), "image")
    val feats = Multimodal.extractFeatures(assets)
    assert(feats.select(org.apache.spark.sql.functions.size(col("embedding")))
      .as[Int].collect().forall(_ === 64))
    // media → features → cosine top-k: the near-identical payload wins
    val top = Similarity.bruteForceTopK(feats, col("vec_id") < 8, 1)
      .select(col("neighbor_id")).as[Long].head()
    assert(top === 10L)
  }

  test("stub image decode is deterministic and batch-shaped") {
    val assets = Multimodal.toAssets(
      Seq((1L, "payload-one".getBytes), (2L, "payload-two".getBytes))
        .toDF("asset_id", "payload"), "image").as[MediaAsset]
    val out = Multimodal.decodeImages(assets).collect().sortBy(_.asset_id)
    assert(out.forall(a => a.width > 0 && a.height > 0))
    val out2 = Multimodal.decodeImages(assets).collect().sortBy(_.asset_id)
    assert(out.map(a => (a.width, a.height)).toSeq === out2.map(a => (a.width, a.height)).toSeq)
  }

  test("resize fits the max-side box, preserves aspect, never upscales") {
    val assets = Multimodal.toAssets(
      Seq((1L, "payload-one".getBytes), (2L, "payload-two".getBytes))
        .toDF("asset_id", "payload"), "image").as[MediaAsset]
    val decoded = Multimodal.decodeImages(assets)
    val resized = Multimodal.resizeImages(decoded, 256).collect().sortBy(_.asset_id)
    val original = decoded.collect().sortBy(_.asset_id)
    resized.zip(original).foreach { case (r, o) =>
      assert(math.max(r.width, r.height) <= 256 ||
        (r.width == o.width && r.height == o.height),
        "either fits the box or was small enough to pass through")
      if ((r.width, r.height) != ((o.width, o.height))) {
        assert(math.max(r.width, r.height) === 256, "downscale lands ON the box edge")
        val ar = o.width.toDouble / o.height
        assert(math.abs(r.width.toDouble / r.height - ar) / ar < 0.02,
          "aspect ratio survives within integer rounding")
      }
    }
    // no-upscale rule: a small image is untouched
    val tiny = Multimodal.resizeImages(decoded, 10000).collect().sortBy(_.asset_id)
    assert(tiny.map(a => (a.width, a.height)).toSeq ===
      original.map(a => (a.width, a.height)).toSeq)
  }

  test("audio decode fills duration from payload length and sample rate") {
    val assets = Multimodal.toAssets(
      Seq((1L, new Array[Byte](32000))).toDF("asset_id", "payload"), "audio")
      .as[MediaAsset]
    val out = Multimodal.decodeAudio(assets).head()
    assert(out.duration_ms === 2000L) // 32000 bytes at 16 kHz
  }

  test("frame sampling yields n evenly spaced frames per asset") {
    val assets = Multimodal.toAssets(
      Seq((1L, ("x" * 100).getBytes)).toDF("asset_id", "payload"), "video")
    val frames = Multimodal.sampleFrames(assets, 4, 10)
      .select(col("frame_idx"), col("frame_off")).as[(Int, Long)].collect().toSeq.sorted
    assert(frames === Seq((0, 0L), (1, 25L), (2, 50L), (3, 75L)))
  }

  test("char-mode frame sampling is well-defined for non-ASCII payloads") {
    // multi-byte UTF-8: byte offsets and char offsets diverge; char
    // mode must slice exactly the i*len/4 CHARACTER window
    val txt = "héllo wörld ünïcode 中文 ¡text! " * 4
    val assets = Multimodal.toAssets(
      Seq((1L, txt.getBytes("UTF-8"))).toDF("asset_id", "payload"), "video")
    val frames = Multimodal.sampleFrames(assets, 4, 8, sliceChars = true)
      .select(col("frame_idx"), col("frame").cast("string"))
      .as[(Int, String)].collect().sortBy(_._1)
    val n = txt.length
    frames.foreach { case (i, f) =>
      val off = (i.toLong * n / 4).toInt
      assert(f === txt.substring(off, math.min(off + 8, n)),
        s"frame $i must be the 8-char window at char offset $off")
    }
  }

  test("filtered ANN scores only keep-list candidates") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (10L, Array(0.9f, 0.1f, 0f), 0),  // kept, lower cosine
      (11L, Array(1f, 0f, 0f), 0))      // identical but NOT kept
      .toDF("vec_id", "embedding", "label")
    val keep = Seq(10L).toDF("vec_id")
    val got = Similarity.filteredTopK(emb, col("vec_id") < 8, keep, 5)
      .select(col("neighbor_id")).as[Long].collect().toSeq
    assert(got === Seq(10L),
      "the perfect-match candidate outside the keep-list must be excluded")
  }

  test("semantic dedup pairs stay within their IVF cell and above the cosine floor") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cells = Similarity.ivfAssign(emb, 8).select(col("vec_id"), col("cell"))
    val pairs = Similarity.semanticPairs(emb, 8, 0.35)
    val crossCell = pairs
      .join(cells.select(col("vec_id").as("vec_a"), col("cell").as("cell_a")), "vec_a")
      .join(cells.select(col("vec_id").as("vec_b"), col("cell").as("cell_b")), "vec_b")
      .filter(col("cell_a") =!= col("cell_b")).count()
    assert(crossCell === 0L, "every semantic pair must join cluster-mates")
    assert(pairs.filter(col("cos") < 0.35).count() === 0L)
    // the apply step: one group label per vector, labels are component minima
    val groups = graft.ext.Dedup.nearDupComponents(
      emb.select(col("vec_id").as("doc_id")),
      pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    assert(groups.count() === emb.count())
    assert(groups.filter(col("group_id") > col("doc_id")).count() === 0L,
      "a component label can never exceed the member id (min-id rule)")
  }

  test("PQ rerank stays inside the shortlist and orders by exact cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val short = Similarity.pqTopK(emb, col("vec_id") < 8, 10, 4, 8, 64)
      .select(col("q_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    val rer = Similarity.pqRerankTopK(emb, col("vec_id") < 8, 3, 10, 4, 8, 64)
      .select(col("q_id"), col("neighbor_id"), col("rnk"), col("cos"))
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(rer.nonEmpty)
    assert(rer.forall { case (q, n, _, _) => short.contains((q, n)) },
      "stage 2 may only re-order stage 1's shortlist, never add candidates")
    rer.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank === byRank.sorted.reverse, "rnk must follow exact cosine desc")
    }
  }

  test("duplicated spans merge overlapping grams into one maximal span") {
    // a 7-token phrase shared by docs 1 and 2 yields three overlapping
    // 5-grams (positions 0,1,2) that must merge into ONE span [0,6];
    // doc 2 carries the phrase after a 2-token prefix, so its span
    // shifts to [2,8]; doc 3 shares nothing and must not appear
    val docs = Seq(
      (1L, "one two three four five six seven unique1 tail1"),
      (2L, "lead pad one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, 5)
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 0L, 6L, 3L), (2L, 2L, 8L, 3L)))
  }

  test("duplicated spans count intra-document repeats too") {
    // the same 5-gram occurs twice INSIDE one doc (positions 0 and 6)
    // — two occurrences anywhere count as duplicated, islands stay
    // separate because the positions are 6 > n apart
    val docs = Seq(
      (1L, "a b c d e filler a b c d e"),
      (2L, "totally unrelated words over here now still going"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, 5)
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 0L, 4L, 1L), (1L, 6L, 10L, 1L)))
  }

  test("duplicated-token fraction covers span docs and zeros the rest") {
    // doc 1: tokens 0..6 of 9 sit in the duplicated span → 7/9; doc 2:
    // tokens 2..8 of 9 → 7/9; doc 3 shares nothing → 0 with n_tok still
    // reported (left join keeps every document)
    val docs = Seq(
      (1L, "one two three four five six seven unique1 tail1"),
      (2L, "lead pad one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedTokenFraction(docs, 5)
      .select(col("doc_id"), col("n_tok"), col("dup_tokens"), col("dup_frac"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 9L, 7L, 0.7778), (2L, 9L, 7L, 0.7778), (3L, 9L, 0L, 0.0)))
  }

  test("containment is directional: a subset doc scores 1.0 into its superset") {
    // doc 2 = doc 1 plus a tail: every doc-1 shingle is in doc 2, so
    // c_1_in_2 = 1.0 while c_2_in_1 and jaccard are diluted by the tail
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),                        // 8 3-gram shingles
      (2L, base + " lambda mu"),         // those 8 + 2 boundary shingles
      (3L, base)                         // identical to doc 1
    ).toDF("doc_id", "text")
    val got = Dedup.lshContainment(docs, 3, 16, 4, 4, 0.5)
      .as[(Long, Long, Double, Double)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 2L, 1.0, 0.8),   // 8/8 into the superset, 8/10 back
      (1L, 3L, 1.0, 1.0),
      (2L, 3L, 0.8, 1.0)))
  }

  test("span apply cuts exactly the duplicated spans and keeps the rest") {
    // docs 1 and 2 share the 7-token run "one two three four five six
    // seven": dup 5-gram positions are 0-2 (doc 1) and 2-4 (doc 2),
    // each merging to ONE span covering the whole run; doc 3 is clean
    val docs = Seq(
      (1L, "one two three four five six seven unique1 tail1"),
      (2L, "lead pad one two three four five six seven"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, 5)
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, "unique1 tail1", 7L),
      (2L, "lead pad", 7L),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota", 0L)))
  }

  test("label centroids are exact fixed-point means per label") {
    val emb = Seq(
      (1L, 0, Array(1.0f, 2.0f)),
      (2L, 0, Array(3.0f, 4.0f)),
      (3L, 1, Array(0.5f, -0.5f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.labelCentroids(emb, 2)
      .as[(Int, Seq[Double], Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (0, Seq(2.0, 3.0), 2L),
      (1, Seq(0.5, -0.5), 1L)))
  }

  test("bloom-prefiltered contamination equals the exact join") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high today"),
      (2L, "completely different text entirely here"),
      (10L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val got = Dedup.bloomContamination(docs, col("doc_id") >= 10L, 3)
      .select(col("train_doc"), col("n_eval_docs"), col("n_shared"))
      .as[(Long, Long, Long)].collect().toSeq
    // eval doc 10 shares exactly its three 3-grams with train doc 1;
    // train doc 2 must be absent (and the bloom must not let a false
    // positive through the confirm join)
    assert(got === Seq((1L, 1L, 3L)))
  }

  test("bloom sizing derives from the eval-gram count, so fpp holds at any eval size") {
    // Eval side deliberately larger than the old fixed 2^17 budget:
    // 1500 docs × 118 distinct 3-grams ≈ 177k eval grams. Every gram is
    // unique to its doc, so there are no true train×eval hits — any
    // train gram passing the bloom is a false positive.
    val toks = 120
    def mkText(prefix: String, i: Int): String =
      (0 until toks).map(j => s"$prefix${i}x$j").mkString(" ")
    val docs = ((0 until 1500).map(i => (i.toLong, mkText("e", i))) ++
      (0 until 400).map(i => ((10000 + i).toLong, mkText("t", i))))
      .toDF("doc_id", "text")
    val isEval = col("doc_id") < 1500L

    // exactness is size-independent: the confirm join kills every fp
    assert(Dedup.bloomContamination(docs, isEval, 3).count() === 0L)

    // the derived size keeps the prefilter's pass-through at the
    // design fpp (3 % default + estimate slack)...
    val sh = Dedup.shingleHashes(docs, 3)
      .join(docs.select(col("doc_id"), isEval.as("is_eval")), "doc_id")
    val evalGrams = sh.filter(col("is_eval")).select(col("h"))
    val trainGrams = sh.filter(!col("is_eval")).select(col("h"))
    val sized = Dedup.bloomExpectedItems(evalGrams, col("h"))
    assert(sized > (1L << 17), s"derived size $sized must track the 177k eval grams")
    val bloom = Dedup.buildBloom(evalGrams, col("h"), sized)
    val nTrain = trainGrams.count().toDouble
    val fpSized = trainGrams.filter(Dedup.mightContain(bloom, col("h"))).count() / nTrain
    assert(fpSized < 0.08, s"sized bloom fp rate $fpSized must stay near design fpp")

    // ...whereas an undersized filter saturates — the failure mode the
    // pre-pass exists to prevent
    val tiny = Dedup.buildBloom(evalGrams, col("h"), 1024L)
    val fpTiny = trainGrams.filter(Dedup.mightContain(tiny, col("h"))).count() / nTrain
    assert(fpTiny > 0.5, s"a 1024-item bloom over 177k grams should saturate, got $fpTiny")
  }

  test("bloom contamination survives an empty eval side") {
    val docs = Seq((1L, "some training words here")).toDF("doc_id", "text")
    val got = Dedup.bloomContamination(docs, lit(false), 3)
    assert(got.count() === 0L)
  }

  test("bigram commonness averages occurrence-level document frequency") {
    // bigrams: doc1 = {a b, b c}, doc2 = {a b, b d}; df(a b)=2, others 1
    // → both docs average (2+1)/2 = 1.5
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = TextOps.bigramCommonness(docs)
      .select(col("doc_id"), col("n_bigrams"), col("avg_df"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === Seq((1L, 2L, 1.5), (2L, 2L, 1.5)))
  }

  test("minhash jaccard estimate is 1.0 for identical documents") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, 3, 16)
    val cands = Dedup.lshCandidatePairs(sigs, 4, 4)
      .select(col("doc_a"), col("doc_b"))
    val a = sigs.select(col("doc_id").as("doc_a") +:
      (0 until 16).map(i => col(s"mh$i").as(s"a$i")): _*)
    val b = sigs.select(col("doc_id").as("doc_b") +:
      (0 until 16).map(i => col(s"mh$i").as(s"b$i")): _*)
    val matches = (0 until 16)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = cands.join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"), (matches / lit(16.0)).as("est"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(est === Seq((1L, 2L, 1.0)),
      "identical docs share every signature component; disjoint docs are not candidates")
  }

  test("mix apply downsamples toward half the equal share with exact integer rates") {
    val rows = SparkEntry.queries("e_mix_apply")(spark, "/root/testdata/sf0.001")
      .select(col("source"), col("src_tokens"), col("rate_pct"),
        col("n_sampled"), col("sampled_tokens"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, srcTok, rate, n, sampTok) =>
      assert(rate >= 0 && rate <= 100, s"$src rate $rate")
      assert(sampTok <= srcTok, s"$src sampled more than it has")
      if (rate == 0) assert(n === 0L)
    }
    // the whole point: achieved mass lands well under the source mass
    val (total, sampled) = (rows.map(_._2).sum.toDouble, rows.map(_._5).sum.toDouble)
    assert(sampled / total < 0.75, s"downsampling must bite (kept ${sampled / total})")
  }

  test("hashSample column-rate overload agrees with the literal form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaInt = docs.filter(TextOps.hashSample(col("lang"), col("doc_id"), 20))
      .select(col("doc_id")).as[Long].collect().toSet
    val viaCol = docs.filter(TextOps.hashSample(col("lang"), col("doc_id"), lit(20)))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(viaInt === viaCol)
  }

  test("SQ8 reconstruction error is within half a quantization step per component") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = graft.ext.Similarity.sq8Quantize(emb)
    // |v - dq| ≤ mx/254 (+1 ulp headroom): round() moves at most half
    // a step, step = mx/127
    val violations = q.filter(size(filter(
      zip_with(col("v"), col("dq"), (a, b) => abs(a - b)),
      e => e > col("mx") / lit(253.99))) > 0).count()
    assert(violations === 0L)
    // codes actually live in int8 range
    val outOfRange = q.filter(size(filter(col("q8"),
      c => abs(c) > 127)) > 0).count()
    assert(outOfRange === 0L)
  }

  test("SQ8 ANN recall on the fixture stays near the exact baseline") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val truth = graft.ext.Similarity.bruteForceTopK(emb, col("vec_id") < 8, 3)
      .select(col("q_id"), col("neighbor_id"))
    val got = graft.ext.Similarity.sq8TopK(emb, col("vec_id") < 8, 3)
      .select(col("q_id"), col("neighbor_id"))
    val n = truth.count().toDouble
    val hit = got.join(truth, Seq("q_id", "neighbor_id"), "left_semi").count()
    assert(hit / n >= 0.8,
      s"int8 rounding should barely perturb top-3 ranks (recall ${hit / n})")
  }

  test("incremental dedup pairs batch docs with corpus docs only") {
    // batch = doc_id % 10 == 0. Planted: batch 10 duplicates corpus 1;
    // batch 20 and 30 duplicate EACH OTHER but no corpus doc; corpus
    // 1 and 2 duplicate each other. Only the batch→corpus pair may
    // surface — corpus×corpus and batch×batch are the corpus-wide
    // queries' business, not the ingest check's.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (20L, "nine eight seven six five four three two one zero"),
      (30L, "nine eight seven six five four three two one zero"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(docs, col("doc_id") % 10 === 0,
        3, 16, 4, 4, 0.5)
      .select(col("batch_doc"), col("corpus_doc"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === Seq((10L, 1L, 1.0), (10L, 2L, 1.0)))
  }

  test("incremental apply admits exactly the unmatched batch docs") {
    val admitted = SparkEntry.queries("d_incremental_apply")(
        spark, "/root/testdata/sf0.001")
      .select(col("doc_id")).as[Long].collect().toSet
    val matched = SparkEntry.queries("d_incremental_dedup")(
        spark, "/root/testdata/sf0.001")
      .select(col("batch_doc")).as[Long].collect().toSet
    val batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 10 === 0).select(col("doc_id")).as[Long].collect().toSet
    assert(admitted === (batch -- matched))
    assert(matched.subsetOf(batch))
  }

  test("incremental pairs are exactly the crossing subset of the corpus-wide LSH pairs") {
    // band cells are symmetric, so probing batch→corpus must find
    // precisely the corpus-wide verified pairs whose endpoints straddle
    // the split (re-oriented batch-first) — the algebraic contract
    // linking the ingest-time and corpus-wide operators
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isBatch = (id: Long) => id % 10 == 0
    val full = Dedup.lshVerifiedJaccard(docs, 3, 16, 4, 4, 0.5)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => isBatch(a) != isBatch(b) }
      .map { case (a, b, j) => if (isBatch(a)) (a, b, j) else (b, a, j) }
      .toSet
    val incr = Dedup.incrementalNearDups(docs, col("doc_id") % 10 === 0,
        3, 16, 4, 4, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr === full)
  }

  test("BPE merge candidates are true 2-char pairs in descending frequency") {
    val rows = SparkEntry.queries("t_bpe_merges")(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toSeq
    assert(rows.size === 20)
    assert(rows.forall(_._1.length == 2), "every candidate is an adjacent char pair")
    assert(rows.map(_._2) === rows.map(_._2).sorted.reverse, "ordered by count desc")
  }

  test("CDC chunk census is consistent: widths bound token counts") {
    val chunks = SparkEntry.queries("t_cdc_chunks")(spark, "/root/testdata/sf0.001")
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        size(graft.codec.Codecs.tokens(col("text"))).cast("long").as("n_tok"))
    val joined = chunks.join(toks, "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, nChunks, maxW, nTok) =>
      if (nTok == 0) assert(nChunks === 0L && maxW === 0L)
      else {
        assert(nChunks >= 1L && nChunks <= nTok, s"doc $id")
        assert(maxW >= 1L && maxW <= nTok, s"doc $id")
        assert(maxW * nChunks >= nTok, s"doc $id: max width must cover the mean")
      }
    }
    // boundaries must actually fire somewhere on the fixture (hash%16
    // ⇒ ~1/16 of tokens), otherwise the rule is vacuous
    assert(joined.exists(_._2 > 1), "no doc chunked — boundary rule never fired")
  }

  test("commonness buckets split common docs from the rare-bigram outlier") {
    // 8 docs share every bigram (avg_df = 8); one doc's bigrams are
    // unique to it (avg_df = 1). With mean±σ/2 cutoffs the outlier is
    // 'tail', the common mass 'middle', and nothing clears 'head'.
    val docs = ((1L to 8L).map(i => (i, "a b c d")) :+ (9L, "x y z w"))
      .toDF("doc_id", "text")
    val got = TextOps.commonnessBuckets(docs)
      .select(col("bucket"), col("n_docs")).as[(String, Long)].collect().toMap
    assert(got === Map("middle" -> 8L, "tail" -> 1L))
  }

  test("hopping window assigns every event to exactly size/slide windows") {
    val hops = SparkEntry.queries("a_hopping_window")(
        spark, "/root/testdata/sf0.001")
    val nEvents = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    val totalAssignments = hops.agg(sum(col("n"))).as[Long].head()
    assert(totalAssignments === 2L * nEvents,
      "30-min windows every 15 min: each event lands in exactly 2 hops")
    val misaligned = hops.filter(col("hop_start_us") % (15L * 60 * 1000000) =!= 0).count()
    assert(misaligned === 0L, "hop starts are epoch-aligned to the slide")
  }

  test("source report's keep-count matches the quality-filter gate") {
    val perSource = SparkEntry.queries("e_source_report")(
        spark, "/root/testdata/sf0.001")
      .agg(sum(col("n_kept"))).as[Long].head()
    val gate = SparkEntry.queries("t_quality_filter")(
        spark, "/root/testdata/sf0.001").count()
    assert(perSource === gate,
      "the report's per-source yields must predict the corpus-wide gate")
  }

  test("edit verify scores an exact copy 1.0 and is candidate-bounded") {
    // docs 1/2 are byte-identical (every minhash equal → guaranteed
    // LSH candidate, lev 0); doc 3 shares no shingles, so it can
    // never become a candidate and no DP runs against it
    val txt = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq((1L, txt), (2L, txt),
      (3L, "completely different words entirely compose this other document here now"))
      .toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(docs, 3, 16, 4, 4, 0.2)
      .select(col("doc_a"), col("doc_b"), col("lev"), col("edit_sim"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 0L, 1.0)))
  }

  test("ngram diversity is the per-source distinct/total gram ratio") {
    val docs = Seq(
      (1L, "a b c d", "A"), (2L, "a b c d", "A"), // 4 grams, 2 distinct
      (3L, "x y z w", "B"), // 2 grams, 2 distinct
      (4L, "xs", "B")) // too short to shingle: contributes nothing
      .toDF("doc_id", "text", "source")
    val got = TextOps.ngramDiversity(docs, 3)
      .select(col("source"), col("n_grams"), col("n_distinct"), col("diversity"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map("A" -> ((4L, 2L, 0.5)), "B" -> ((2L, 2L, 1.0))))
  }

  test("source KL is zero for a single source and ln(N/n_s) for disjoint vocabularies") {
    val one = Seq((1L, "a a b", "A"), (2L, "b a", "A")).toDF("doc_id", "text", "source")
    val kl0 = TextOps.sourceUnigramKl(one).select(col("kl")).as[Double].head()
    assert(kl0 === 0.0, "p_s == p_c when there is one source")
    // disjoint halves of equal size: every token ratio is N/n_s = 2,
    // so KL = ln 2 for both sources
    val two = Seq((1L, "a a b b", "A"), (2L, "c c d d", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.sourceUnigramKl(two)
      .select(col("source"), col("kl")).as[(String, Double)].collect().toMap
    assert(got === Map("A" -> 0.6931, "B" -> 0.6931))
  }

  test("DSIR weights are zero when the target is the whole corpus and signed toward the slice") {
    // target == corpus → the two bucket models coincide → every
    // log-ratio is exactly 0
    val docs = Seq((1L, "a b a b", "A"), (2L, "x y x y", "B"))
      .toDF("doc_id", "text", "source")
    val allTgt = TextOps.dsirWeights(docs, lit(true), 1024)
      .select(col("log_w")).as[Double].collect().toSeq
    assert(allTgt === Seq(0.0, 0.0))
    // target = source A with disjoint bigrams: A-docs score positive,
    // B-docs negative
    val got = TextOps.dsirWeights(docs, col("source") === "A", 1024)
      .select(col("doc_id"), col("log_w")).as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.0 && got(2L) < 0.0,
      s"importance must point toward the target slice: $got")
  }

  test("cross-doc substring dedup finds the maximal shared substring, ignores within-doc repeats") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f g z"),
      (3L, "completely different tokens only here now"),
      (4L, "p q r s t u p q r s t u")) // 5-gram repeats, but single-doc
      .toDF("doc_id", "text")
    val got = Dedup.crossDocSubstrings(docs, 5, 30)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // docs 1 and 2 share "a b c d e f g" (7 tokens): three start
    // positions carry a cross-doc 5-gram; docs 3 and 4 must be absent
    // (no cross-doc gram at all / within-doc only)
    assert(got === Array(
      (1L, 3L, 7L, "a b c d e f g"),
      (2L, 3L, 7L, "a b c d e f g")))
  }

  test("cross-doc substring fraction and apply cover the interval union of nested matches") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f g z"),
      (3L, "completely different tokens only here now")).toDF("doc_id", "text")
    // matches nest: doc1 positions 0/1/2 (len 7/6/5) all cover [0,6];
    // doc2 positions 2/3/4 cover [2,8] — 7 of 10 tokens each
    val frac = Dedup.crossDocDupFraction(docs, 5, 30)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(frac === Array(
      (1L, 10L, 7L, 0.7), (2L, 10L, 7L, 0.7), (3L, 6L, 0L, 0.0)))
    val applied = Dedup.removeCrossDocSubstrings(docs, 5, 30)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(applied === Array(
      (1L, "h i j", 7L), (2L, "x y z", 7L),
      (3L, "completely different tokens only here now", 0L)))
  }

  test("substring dedup occurrence cap drops hot-gram buckets, keeps the rest") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f g z")).toDF("doc_id", "text")
    // every shared gram occurs exactly twice: a cap of 2 changes
    // nothing; a cap of 1 drops every bucket (the degenerate dial)
    assert(Dedup.crossDocSubstrings(docs, 5, 30, maxOcc = 2).count() === 2L)
    assert(Dedup.crossDocSubstrings(docs, 5, 30, maxOcc = 1).count() === 0L)
  }

  test("cross-doc substring match length is capped at maxLcp tokens") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f g z")).toDF("doc_id", "text")
    val got = Dedup.crossDocSubstrings(docs, 5, 6)
      .select(col("doc_id"), col("max_len"), col("longest_sub"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // pos0 and pos1 both cap at 6 tokens; the tie breaks toward the
    // lexicographically-larger substring ("b c d e f g" > "a b c d e f")
    assert(got === Array((1L, 6L, "b c d e f g"), (2L, 6L, "b c d e f g")))
  }

  test("char-level substring dedup catches mid-word runs the token family misses") {
    // the shared run starts mid-word ("llofrom...") and spans token
    // boundaries; at n=10 chars it is exact for the char family, while
    // the 5-token family sees no 5 shared consecutive TOKENS
    val docs = Seq(
      (1L, "xhello worlds apart entirely"),
      (2L, "yhello worlds apart utterly"),
      (3L, "nothing in common here at all")).toDF("doc_id", "text")
    val tok = Dedup.crossDocSubstrings(docs, 5, 30)
    assert(tok.count() === 0L, "token family must not fire on < 5 shared tokens")
    val got = Dedup.crossDocSubstringsChar(docs, 10, 40)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    // longest shared char run: "hello worlds apart " (19 chars), one
    // char in from each doc's start
    assert(got.map(_._1).toSeq === Seq(1L, 2L))
    assert(got.forall(_._2 == "hello worlds apart "), got.mkString(", "))
  }

  test("char-level occurrence cap drops hot-gram buckets like the token dial") {
    // every shared 10-char gram occurs exactly twice (once per doc):
    // a cap of 2 changes nothing; a cap of 1 drops every bucket
    val docs = Seq(
      (1L, "xhello worlds apart entirely"),
      (2L, "yhello worlds apart utterly")).toDF("doc_id", "text")
    assert(Dedup.crossDocSubstringsChar(docs, 10, 40, maxOcc = 2).count() === 2L)
    assert(Dedup.crossDocSubstringsChar(docs, 10, 40, maxOcc = 1).count() === 0L)
  }

  test("bigram cross-entropy scores the add-one-smoothed conditional LM") {
    // corpus: "a b", "a b", "a c", "solo" — c(a·)=3, V=4 (solo's
    // token counts toward the vocabulary);
    // p(b|a) = (2+1)/(3+4) = 3/7, p(c|a) = (1+1)/7 = 2/7
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramCrossEntropy(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lnB = math.rint(math.log(7.0 / 3.0) * 1e4) / 1e4
    val lnC = math.rint(math.log(7.0 / 2.0) * 1e4) / 1e4
    // single-token doc 4 has no bigram occurrences and no row
    assert(got === Array((1L, 1L, lnB), (2L, 1L, lnB), (3L, 1L, lnC)))
  }

  test("trigram cross-entropy conditions on the two-token context") {
    // corpus: "a b c" ×2, "a b d", "xy" — c(a b ·)=3, V=5;
    // p(c|a b) = (2+1)/(3+5) = 3/8, p(d|a b) = (1+1)/8 = 1/4
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"), (4L, "xy"))
      .toDF("doc_id", "text")
    val got = TextOps.trigramCrossEntropy(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lnC = math.rint(math.log(8.0 / 3.0) * 1e4) / 1e4
    val lnD = math.rint(math.log(4.0) * 1e4) / 1e4
    // two-token doc 4 has no trigram occurrences and no row
    assert(got === Array((1L, 1L, lnC), (2L, 1L, lnC), (3L, 1L, lnD)))
  }

  test("JS divergence refuses a source count past the pair gate") {
    val docs = Seq(
      (1L, "a b", "s1"), (2L, "b c", "s2"), (3L, "c d", "s3"))
      .toDF("doc_id", "text", "source")
    // 3 sources -> 3 pairs: fine at the default gate, loud at 2
    assert(TextOps.sourceJsDivergence(docs).count() === 3L)
    val e = intercept[IllegalArgumentException] {
      TextOps.sourceJsDivergence(docs, maxPairs = 2L)
    }
    assert(e.getMessage.contains("maxPairs"))
  }

  test("char-level fraction and apply cover the island union, cutting mid-word") {
    val docs = Seq(
      (1L, "xhello worlds apart entirely"),
      (2L, "yhello worlds apart utterly"),
      (3L, "nothing in common here at all")).toDF("doc_id", "text")
    // shared island per doc: chars [1, 19] ("hello worlds apart ") —
    // 19 of 28 / 27 normalized chars
    val frac = Dedup.crossDocDupFractionChar(docs, 10, 40)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(frac === Array(
      (1L, 28L, 19L, 0.6786), (2L, 27L, 19L, 0.7037), (3L, 29L, 0L, 0.0)))
    val applied = Dedup.removeCrossDocSubstringsChar(docs, 10, 40)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the cut starts mid-"xhello": the leading x/y survives, the run
    // (incl. its trailing space) goes
    assert(applied === Array(
      (1L, "xentirely", 19L), (2L, "yutterly", 19L),
      (3L, "nothing in common here at all", 0L)))
  }

  test("composite-predicate DSIR target equals its single-target run") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pred = col("source") === "src0" && col("lang") === "en"
    val slice = TextOps.dsirWeightsMulti(docs,
        Seq("x" -> pred, "zh" -> (col("lang") === "zh")), 1024)
      .filter(col("target") === "x")
      .select(col("doc_id"), col("n_grams"), col("log_w"))
    val single = TextOps.dsirWeights(docs, pred, 1024)
      .select(col("doc_id"), col("n_grams"), col("log_w"))
    assert(slice.exceptAll(single).count() === 0L &&
      single.exceptAll(slice).count() === 0L,
      "a composite-predicate slice must reproduce the single-target weights")
  }

  test("multi-target DSIR reproduces the single-target weights per slice") {
    // the one-pass k-target form must be VALUE-identical to k
    // single-target runs — same substrate, same smoothing, same
    // rounding — or the multi-tenant claim is a different model
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // K=2 and K=3 (the registry's two dials): K-generic means EVERY K
    // reproduces its slices, not just the pairwise case
    for (targets <- Seq(Seq("src0", "src1"), Seq("src0", "src1", "src2"))) {
      val multi = TextOps.dsirWeightsMulti(docs,
        targets.map(t => t -> (col("source") === t)), 1024)
      for (t <- targets) {
        val single = TextOps.dsirWeights(docs, col("source") === t, 1024)
          .select(col("doc_id"), col("n_grams"), col("log_w"))
        val slice = multi.filter(col("target") === t)
          .select(col("doc_id"), col("n_grams"), col("log_w"))
        assert(slice.exceptAll(single).count() === 0L &&
          single.exceptAll(slice).count() === 0L,
          s"multi-target (K=${targets.size}) slice $t diverges from the single-target run")
      }
    }
  }

  test("e_dsir_apply rank-100/101 key gap dwarfs double ulp at both gate scales") {
    // The cross-engine-compared top-100 rides a raw double order-by
    // (log(u)/exp(log_w)) — fixed-decimal rounding is a no-op at the
    // key's ~1e19 dynamic range, so instead pin the property that
    // keeps the LIMIT boundary engine-stable: the gap between ranks
    // 100 and 101 must sit orders of magnitude above the ulp of the
    // keys themselves, so libm noise can never flip rows between
    // Spark and the DuckDB oracle.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val u = (pmod(graft.codec.Codecs.portableHash(col("doc_id").cast("string")),
        lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
      val keys = TextOps.dsirWeights(docs, col("source") === "src0", 1024)
        .select((log(u) / exp(col("log_w"))).as("es_key"))
        .orderBy(col("es_key").desc).limit(102)
        .as[Double].collect()
      assert(keys.length >= 101, s"$sf fixture too small for a top-100 boundary")
      val gap = keys(99) - keys(100)
      val noise = math.ulp(math.max(math.abs(keys(99)), math.abs(keys(100))))
      assert(gap > 1e6 * noise,
        s"$sf rank-100/101 key gap $gap is within libm noise range ($noise)")
    }
  }

  test("e_dsir_multi_apply per-target rank-50/51 key gap dwarfs double ulp") {
    // the multi-target resample rides the same raw-double ES key as
    // e_dsir_apply, now ranked per target slice: each target's
    // LIMIT boundary must sit orders of magnitude above libm noise or
    // the top-50 SET could differ between Spark and DuckDB
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val multi = TextOps.dsirWeightsMulti(docs,
        Seq("src0", "src1", "src2").map(t => t -> (col("source") === t)), 1024)
      val u = (pmod(graft.codec.Codecs.portableHash(col("doc_id").cast("string")),
        lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
      for (t <- Seq("src0", "src1", "src2")) {
        val keys = multi.filter(col("target") === t)
          .select((log(u) / exp(col("log_w"))).as("es_key"))
          .orderBy(col("es_key").desc).limit(52)
          .as[Double].collect()
        assert(keys.length >= 51, s"$sf/$t too small for a top-50 boundary")
        val gap = keys(49) - keys(50)
        val noise = math.ulp(math.max(math.abs(keys(49)), math.abs(keys(50))))
        assert(gap > 1e6 * noise,
          s"$sf/$t rank-50/51 key gap $gap is within libm noise range ($noise)")
      }
    }
  }

  test("payload dedup ledger counts identical binary payloads once per keeper") {
    val assets = Seq((5L, "same bytes"), (2L, "same bytes"), (9L, "other"))
      .toDF("asset_id", "text")
      .select(col("asset_id"), col("text").cast("binary").as("payload"))
    val rows = Multimodal.payloadDedup(assets)
      .select(col("n_copies"), col("keeper"))
      .as[(Long, Long)].collect().toSet
    assert(rows === Set((2L, 2L), (1L, 9L)))
  }

  test("centroid classify breaks exact-tie assignments toward the smaller label") {
    // both labels have the SAME centroid (0.5, 0.5), so every vector
    // ties on cosine and the argmax struct's -label term must decide:
    // everything predicts label 0 → label 0 scores 1.0, label 1 zero
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0),
      (3L, Array(1f, 0f), 1), (4L, Array(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidClassify(emb, 2)
      .select(col("label"), col("accuracy")).as[(Int, Double)].collect().toMap
    assert(got === Map(0 -> 1.0, 1 -> 0.0))
  }

  test("label affinity is the upper-triangle centroid cosine") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 1), (3L, Array(1f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelAffinity(emb, 2)
      .select(col("label_a"), col("label_b"), col("cos"))
      .as[(Int, Int, Double)].collect().toSet
    val h = math.sqrt(0.5) // cos between an axis and the diagonal
    assert(got === Set((0, 1, 0.0),
      (0, 2, math.rint(h * 10000) / 10000), (1, 2, math.rint(h * 10000) / 10000)))
  }

  test("winnowing guarantees a shared fingerprint for any long-enough verbatim match") {
    // the Schleimer guarantee: a verbatim run of >= w+n-1 tokens
    // (here 4+3-1 = 6; planted: 8) must contribute at least one
    // common fingerprint VALUE to both documents
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"unrelated prefix words here $shared and a suffix"),
      (2L, s"totally different opening $shared closing differently now"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnow(docs, 3, 4)
      .select(col("doc_id"), col("fp")).as[(Long, Long)].collect()
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    assert(a.intersect(b).nonEmpty, "the planted 8-token run must be fingerprinted in both")
    // density: winnowing stores ~2/(w+1) of grams — far fewer than all
    val grams = 10 + 3 - 1 // ~tokens - n + 1 per doc
    assert(a.size < grams, "winnowing must select a strict subset of grams")
  }

  test("label outliers flag the vector pointing away from its centroid") {
    val emb = ((1L to 5L).map(i => (i, Array(1f, 0f), 0)) :+ ((6L, Array(-1f, 0f), 0)))
      .toDF("vec_id", "embedding", "label")
    // centroid (2/3, 0); cos: five at 1.0, one at -1.0 → mu = 2/3,
    // σ_pop = 0.7454, z_outlier = -2.236 ≤ -2; inliers z = +0.447
    val got = Similarity.labelOutliers(emb, 2, 2.0)
      .select(col("vec_id"), col("z")).as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(6L))
    assert(math.abs(got.head._2 - -2.2361) < 1e-4)
  }

  test("decontam gate genuinely changes the curation draw (and the draw is clean)") {
    val dir = "/root/testdata/sf0.001"
    val docs = SparkEntry.T(spark, dir, "documents")
    val marks = docs.select(col("doc_id"),
      TextOps.hashSample(col("lang"), col("doc_id"), 20).as("is_eval"))
    val pairs = Dedup.lshVerifiedJaccard(docs, 3, 16, 4, 4, 0.5)
      .select("doc_a", "doc_b")
    val marked = pairs
      .join(marks.select(col("doc_id").as("doc_a"), col("is_eval").as("eval_a")), "doc_a")
      .join(marks.select(col("doc_id").as("doc_b"), col("is_eval").as("eval_b")), "doc_b")
    val bad = marked.filter(col("eval_a") =!= col("eval_b"))
      .select(when(col("eval_a"), col("doc_b")).otherwise(col("doc_a")).as("doc_id"))
      .distinct()
    val badIds = bad.as[Long].collect().toSet
    assert(badIds.nonEmpty, "fixture must contain cross-split contamination")
    val evalIds = marks.filter(col("is_eval")).select("doc_id").as[Long].collect().toSet

    val gated = SparkEntry.queries("e_decontam_curation")(spark, dir)
      .select(col("target"), col("doc_id")).as[(String, Long)].collect().toSet
    // the draw must be contamination- and eval-free by construction
    assert(gated.forall { case (_, d) => !badIds(d) && !evalIds(d) })

    // ungated twin: identical chain minus the contamination anti-join
    val train0 = docs.join(marks.filter(!col("is_eval")).select("doc_id"), "doc_id")
    val ids0 = train0.select("doc_id")
    val tp0 = pairs
      .join(ids0.select(col("doc_id").as("doc_a")), "doc_a")
      .join(ids0.select(col("doc_id").as("doc_b")), "doc_b")
    val keep0 = Dedup.nearDupComponents(ids0, tp0)
      .filter(col("doc_id") === col("group_id")).select("doc_id")
    val ungated = SparkEntry.esTopKPerTarget(TextOps.dsirWeightsMulti(
      train0.join(keep0, "doc_id"),
      Seq("src0" -> (col("source") === "src0"),
        "src1" -> (col("source") === "src1"),
        "src2" -> (col("source") === "src2")), 1024), 50)
      .select(col("target"), col("doc_id")).as[(String, Long)].collect().toSet
    assert(gated !== ungated,
      "the decontam gate must change the downstream draw on this fixture")
  }

  test("chunk dedup keeps the global first occurrence and reassembles in order") {
    val c16 = (1 to 16).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$c16 tail tokens here"),          // chunk0 = c16 (keeper), chunk1 short
      (2L, c16),                               // whole doc duplicated -> emptied
      (3L, s"alpha beta gamma $c16")           // c16 NOT chunk-aligned -> untouched
    ).toDF("doc_id", "text")
    val rep = Dedup.chunkDedupReport(docs, 16)
      .select(col("n_copies"), col("n_docs"), col("keeper_doc"), col("keeper_chunk"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep === Seq((2L, 2L, 1L, 0L)),
      "one duplicated chunk, first occurrence = (doc 1, chunk 0); the " +
        "unaligned copy in doc 3 is invisible to the fixed-boundary family")
    val app = Dedup.chunkDedupApply(docs, 16)
      .select(col("doc_id"), col("n_kept"), col("n_dropped"), col("text"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(app(1L) === ((1L, 2L, 0L, s"$c16 tail tokens here")))
    assert(app(2L) === ((2L, 0L, 1L, "")), "fully-duplicated doc survives empty")
    assert(app(3L)._4 === s"alpha beta gamma $c16")
  }

  test("dropping a middle chunk splices the surviving chunks in chunk order") {
    val a = (1 to 16).map(i => s"a$i").mkString(" ")
    val dup = (1 to 16).map(i => s"d$i").mkString(" ")
    val z = (1 to 16).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, dup), (2L, s"$a $dup $z")).toDF("doc_id", "text")
    val app = Dedup.chunkDedupApply(docs, 16)
      .filter(col("doc_id") === 2L)
      .select(col("n_kept"), col("n_dropped"), col("text"))
      .as[(Long, Long, String)].head()
    assert(app === ((2L, 1L, s"$a $z")))
  }

  test("iterative label propagation equals the driver union-find fast path") {
    val docs = (1L to 9L).toDF("doc_id")
    // two chains and one triangle; 4 and 9 are singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L), (8L, 3L))
      .toDF("doc_a", "doc_b")
    val fast = Dedup.nearDupComponents(docs, pairs)
      .as[(Long, Long)].collect().toMap
    val iter = Dedup.nearDupComponents(docs, pairs, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(iter === fast)
    assert(iter === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 9L -> 9L))
  }

  test("a_ewma: first event per user equals its own value; constants are fixed points") {
    val dir = "/root/testdata/sf0.001"
    val ev = SparkEntry.T(spark, dir, "events")
    val first = ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("event_id"),
        (round(col("value") * 1000).cast("long").cast("double") / 1000.0).as("v"))
    val got = SparkEntry.queries("a_ewma")(spark, dir)
      .join(first, "event_id")
    assert(got.count() > 0)
    val off = got.filter(abs(col("ewma") - round(col("v"), 4)) > 1e-9).count()
    assert(off === 0, "a frame of length 1 must return the value itself")
  }

  test("a_funnel enforces strict step order and the 6-hour conversion window") {
    val t0 = 1700000000000L
    def ts(offMin: Long) = new java.sql.Timestamp(t0 + offMin * 60000L)
    val rows = Seq(
      // user 1: clean view -> click -> purchase inside the window
      (1L, ts(0), 101L, "view"), (1L, ts(60), 102L, "click"), (1L, ts(120), 103L, "purchase"),
      // user 2: the click PRECEDES the first view -> depth 1
      (2L, ts(0), 201L, "click"), (2L, ts(60), 202L, "view"),
      // user 3: click 7h after the view -> outside the window -> depth 1
      (3L, ts(0), 301L, "view"), (3L, ts(420), 302L, "click"),
      // user 4: never views -> depth 0
      (4L, ts(0), 401L, "error"))
    val dir = java.nio.file.Files.createTempDirectory("funnel-fixture").toString
    rows.toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("a_funnel")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 1L, 1L -> 2L, 0L -> 1L))
  }

  test("a_cohort: offset 0 holds the whole cohort; offsets are non-negative") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("a_cohort")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got.forall(_._2 >= 0L))
    val atZero = got.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    val cohortSizes = SparkEntry.T(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .groupBy("user_id").agg(min(col("wk")).as("cw"))
      .groupBy(unix_micros(col("cw")).as("cwus")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(atZero === cohortSizes,
      "every user is active in their own first week by definition")
  }

  test("a_concurrency_dense: gap days report the carried-in level; boundary days agree with the sparse form") {
    val us = 86400000000L
    // five single-event (point) sessions on days 0, 2, 3, 5 and 8 —
    // the 30-min sessionize gap splits every pair — so days 1, 4, 6
    // and 7 have NO boundary rows at all: the sparse report omits
    // them, the dense spine must carry them at level 0
    def ts(u: Long) = new java.sql.Timestamp(u / 1000L)
    val rows = Seq(
      (1L, ts(1000L), 101L, "view"),
      (1L, ts(5L * us + 1000L), 102L, "view"),
      (2L, ts(2L * us), 201L, "view"),
      (2L, ts(3L * us), 202L, "view"),
      (3L, ts(8L * us), 301L, "view"))
    val dir = java.nio.file.Files.createTempDirectory("conc-fixture").toString
    rows.toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val dense = SparkEntry.queries("a_concurrency_dense")(spark, dir)
      .as[(Long, Long)].collect().toMap
    val sparse = SparkEntry.queries("a_concurrency")(spark, dir)
      .as[(Long, Long)].collect().toMap
    // the spine covers every day of the span, gaps included
    assert(dense.keySet === (0L to 8L).toSet, s"dense days: ${dense.keySet}")
    // days with boundary activity agree with the sparse form
    sparse.foreach { case (d, p) =>
      assert(dense(d) === p, s"day $d: dense ${dense(d)} vs sparse $p")
    }
    // gap days (single-point sessions here, so nothing stays open):
    // carried-in level is zero, and the sparse form omits them
    for (d <- Seq(1L, 4L, 6L, 7L)) {
      assert(!sparse.contains(d), s"sparse must omit boundary-free day $d")
      assert(dense(d) === 0L, s"gap day $d carries zero open sessions")
    }
  }

  test("t_hash_score: n_feat is the bigram count; sub-2-token docs are absent") {
    val dir = "/root/testdata/sf0.001"
    val docs = SparkEntry.T(spark, dir, "documents")
      .select(col("doc_id"), size(graft.codec.Codecs.tokens(col("text"))).as("n_tok"))
    val got = SparkEntry.queries("t_hash_score")(spark, dir)
    val joined = got.join(docs, "doc_id")
    assert(joined.filter(col("n_feat") =!= col("n_tok") - 1).count() === 0)
    assert(got.count() === docs.filter(col("n_tok") >= 2).count())
  }

  test("Kneser-Ney quarters arithmetic matches hand-computed KN values") {
    // corpus "a b a b a c": bigrams ab ab ba ba ac
    // p(b|a) = (2-3/4)/3 + (3/4 * 2/3)(1/3) = 0.583333 -> trunc e6 583332
    // p(a|b) = (2-3/4)/2 + (3/4 * 1/2)(1/3) = 0.750000
    // p(c|a) = (1-3/4)/3 + (3/4 * 2/3)(1/3) = 0.250000 -> 249999
    val occ = Seq((1L, "a b"), (1L, "b a"), (1L, "a b"), (1L, "b a"), (1L, "a c"))
      .toDF("doc_id", "s")
    val got = SparkEntry.kneserNeyTop(occ, 10)
      .select(col("w1"), col("w2"), col("p_kn_e6"))
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 583332L), ("b", "a", 750000L), ("a", "c", 249999L)))
  }

  test("binary code words pack sign bits: bit i of word w = sign(v[32w+i+1])") {
    val v = (1 to 64).map(d => if (d % 3 == 0) 1.0f else -1.0f).toArray
    val df = Seq((0L, v)).toDF("vec_id", "embedding")
      .withColumn("v", Similarity.asDouble(col("embedding")))
    val (c0, c1) = df.select(
      Similarity.binaryCodeWord(col("v"), 0).as("c0"),
      Similarity.binaryCodeWord(col("v"), 1).as("c1"))
      .as[(Long, Long)].head()
    val exp0 = (0 until 32).filter(i => (i + 1) % 3 == 0).map(1L << _).sum
    val exp1 = (0 until 32).filter(i => (i + 33) % 3 == 0).map(1L << _).sum
    assert((c0, c1) === ((exp0, exp1)))
  }

  /** Deterministic non-degenerate embedding fixture for ANN specs. */
  private def annFixture(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map { id =>
      (id.toLong, 0L, (1 to 64).map(d => ((id * 37 + d * 13) % 17 - 8) / 8.0f).toArray)
    }.toDF("vec_id", "label", "embedding")

  test("hammingTopK admitting every candidate equals brute force exactly") {
    val emb = annFixture(20)
    val pred = col("vec_id") < 2
    val ham = Similarity.hammingTopK(emb, pred, 3, 18)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.bruteForceTopK(emb, pred, 3)
      .collect().map(_.toSeq).toSet
    assert(ham === brute, "with nCand = |store| the rerank IS brute force")
  }

  test("hammingTopK returns k ranked rows per query from the pruned candidate set") {
    val emb = annFixture(40)
    val out = Similarity.hammingTopK(emb, col("vec_id") < 3, 5, 8)
      .select(col("q_id"), col("rnk")).as[(Long, Int)].collect().toSeq
    assert(out.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap ===
      Map(0L -> Seq(1, 2, 3, 4, 5), 1L -> Seq(1, 2, 3, 4, 5), 2L -> Seq(1, 2, 3, 4, 5)))
  }
}

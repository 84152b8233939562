package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis => TA}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the old river bank today"),
    (2L, "The quick brown fox jumps over the lazy dog near the old river bank now"),
    (3L, "Completely different content about spark query engines and distributed joins here"),
    (4L, "the quick BROWN fox... jumps over the lazy dog near the old river bank today!")
  ).toDF("doc_id", "text")

  test("normalize: case/punct/whitespace canonicalization") {
    val r = Seq("  Hello,   WORLD!! 42 ").toDF("text")
      .select(TA.normalize(col("text"))).as[String].head()
    assert(r == "hello world 42")
  }

  test("exactDedup: doc 4 collapses onto doc 1 after normalization") {
    val r = Dedup.exactDedup(docs).as[(String, Long, Long)].collect()
    val groups = r.map(t => t._2 -> t._3).toMap
    assert(groups(1L) == 2L) // docs 1+4 same normalized text
    assert(r.length == 3)
  }

  test("shingles: n-gram count and short-text fallback") {
    val n = Seq("a b c d e").toDF("text")
      .select(size(TA.shingles(col("text"), 3))).as[Int].head()
    assert(n == 3) // abc bcd cde
    val short = Seq("a b").toDF("text")
      .select(TA.shingles(col("text"), 5)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("nearDupPairs: catches the near-identical pair, not the distinct doc") {
    val pairs = Dedup.nearDupPairs(docs, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedupClusters: transitive near-dups share one survivor, distinct docs self-survive") {
    val m = Dedup.dedupClusters(docs, 0.5)
      .as[(Long, Long)].collect().toMap
    // every doc labeled; the distinct doc is its own survivor
    assert(m.keySet == docs.select("doc_id").as[Long].collect().toSet)
    assert(m(3L) == 3L)
    // near-dups of doc 1 collapse onto the cluster min (doc 1)
    val cluster = m.filter(_._2 == 1L).keySet
    assert(cluster.contains(1L) && cluster.size >= 2)
    // survivors are cluster minima
    m.foreach { case (d, k) => assert(k <= d) }
  }

  test("simhash16: deterministic, near-dups closer than distinct docs") {
    val sk = docs.select(col("doc_id"), Dedup.simhash16(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sk.values.forall(v => v >= 0 && v < (1L << 16)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sk(1L), sk(2L)) <= ham(sk(1L), sk(3L)))
    assert(ham(sk(1L), sk(4L)) == 0) // identical tokens after normalize
  }

  test("languageId: stopword argmax with und fallback") {
    val r = Seq(
      (1L, "the cat and the dog of it was for that"),
      (2L, "el perro y la casa de los que por con un"),
      (3L, "zzz qqq xxx")
    ).toDF("doc_id", "text")
    val out = TA.languageId(r).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "es" && out(3L) == "und")
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = Seq("Hello, world! x2").toDF("text").select(
      TA.tokenCount(col("text")).as("ws"),
      TA.bpeishCount(col("text")).as("bp")).as[(Int, Int)].head()
    // normalized "hello world x2" -> 3 ws tokens
    // bpeish: Hello , world ! x 2 -> 6 pieces
    assert(r == ((3, 6)))
  }

  test("cosine: identical vectors 1.0, orthogonal 0.0") {
    val df = Seq((Seq(1f, 0f), Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b", "c")
    val (ab, ac) = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).as[(Double, Double)].head()
    assert(math.abs(ab - 1.0) < 1e-12 && math.abs(ac) < 1e-12)
  }

  test("bruteForceTopK: self is rank 1, k bounds output") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.9f, 0.1f, 0f)),
      (2L, Seq(0f, 1f, 0f)), (3L, Seq(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val r = Similarity.bruteForceTopK(vecs, q, 2)
      .orderBy("rnk").select("vec_id").as[Long].collect()
    assert(r.sameElements(Array(0L, 1L)))
  }

  test("ivfTopK: cell assignment is argmax-cosine; probe finds the true NN") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f)),        // centroids (nlist=2)
      (2L, Seq(0.95f, 0.05f, 0f)), (3L, Seq(0.1f, 0.9f, 0f)),
      (4L, Seq(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val cents = Similarity.ivfFitDeterministic(vecs, 2)
    assert(cents.size == 2 && cents.head == Seq(1.0, 0.0, 0.0))
    // assignment: 0,2 → cell 0; 1,3 → cell 1; 4 (orthogonal to both,
    // tie at sim 0) → lowest cell 0
    val cellOf = vecs.select(col("vec_id"),
      Similarity.ivfCell(col("embedding"), cents).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(cellOf == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0))
    val q = vecs.filter(col("vec_id") === 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // nprobe=1 searches only cell 0 → candidates {0,2,4}, NN order 2,0
    val r = Similarity.ivfTopK(vecs, q, 2, cents, nprobe = 1)
      .orderBy("rnk").select("vec_id").as[Long].collect()
    assert(r.sameElements(Array(2L, 0L)))
    // nprobe=2 widens to every cell — equals brute force here
    val r2 = Similarity.ivfTopK(vecs, q, 5, cents, nprobe = 2)
    assert(r2.count() == 5)
  }

  test("lshBucket: deterministic and stable across evaluations") {
    val vecs = Seq((0L, Seq.fill(8)(0.5f)), (1L, Seq.fill(8)(-0.5f)))
      .toDF("vec_id", "embedding")
    val b1 = vecs.select(Similarity.lshBucket(col("embedding"), 4, 8))
      .as[Long].collect()
    val b2 = vecs.select(Similarity.lshBucket(col("embedding"), 4, 8))
      .as[Long].collect()
    assert(b1.sameElements(b2))
    assert(b1.forall(b => b >= 0 && b < 16))
  }

  test("decontaminate: docs sharing a benchmark n-gram are flagged, others kept") {
    import graft.pipeline.Decontaminate
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // leaks the benchmark sentence verbatim inside other text
      (1L, "intro text the quick brown fox jumps over the lazy dog outro"),
      // shares words but no 8-gram
      (2L, "the quick brown fox sat still and the lazy dog slept"),
      (3L, "completely unrelated content about spark query planning"))
      .toDF("doc_id", "text")
    val hits = Decontaminate.contaminationHits(corpus, bench, 8)
      .select("doc_id", "n_bad_grams")
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet == Set(1L), s"wrong contamination set: $hits")
    // doc 1 contains the full 9-token benchmark run → two 8-grams hit
    assert(hits(1L) == 2L)
    val kept = Decontaminate.clean(corpus, bench, 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("planesForCorpus: expected bucket population stays ≤ target as N grows") {
    // the dial that keeps banded LSH linear: buckets ~ N/2^planes
    for (n <- Seq(1000L, 20000L, 60000L, 1000000L, 1000000000L)) {
      val p = Similarity.planesForCorpus(n, targetBucket = 16)
      assert(n.toDouble / math.pow(2, p) <= 16.0,
        s"N=$n planes=$p leaves expected bucket > target")
      assert(n.toDouble / math.pow(2, p) > 8.0 || p == 8,
        s"N=$n planes=$p overshoots (wasted recall)")
    }
    // floor holds for tiny corpora
    assert(Similarity.planesForCorpus(10) == 8)
    // the dial grows with N (fixed planes is what went superlinear in
    // the sf1→sf3 measurements): 20k→11, 60k→12, 600k→16 planes
    assert(Similarity.planesForCorpus(20000L) == 11)
    assert(Similarity.planesForCorpus(60000L) == 12)
    assert(Similarity.planesForCorpus(600000L) == 16)
  }

  test("lshBucket at production shape (dims=768, planes=16) keeps a constant-size plan") {
    // the unrolled per-term form was planes*dims expression nodes
    // (12k+ here, 260k at dims=4096/planes=64) — Catalyst planning
    // blew up and codegen fell past the 64KB method limit; the
    // data-driven form is a constant handful of nodes at any shape
    val dims = 768
    val vecs = spark.range(50).select(col("id").as("vec_id"),
      expr(s"transform(sequence(1, $dims), i -> cast(sin(id * i) as float))")
        .as("embedding"))
    // (higher-order fns evaluate interpreted in Spark — no doGenCode —
    // but so would a 12k-node unrolled sum after the 64KB codegen
    // limit; what the data-driven form buys is CONSTANT planning cost)
    val bucketed = vecs.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 16, dims).as("b"))
    // the 16x768 plane matrix is ONE Literal node (its string render
    // is long, but Catalyst sees a single value); the whole expression
    // tree must stay a constant handful of nodes
    val nodes = bucketed.queryExecution.optimizedPlan.expressions
      .map(e => { var n2 = 0; e.foreach(_ => n2 += 1); n2 }).sum
    assert(nodes < 500, s"plan exploded: $nodes expression nodes")
    val rows = bucketed.as[(Long, Long)].collect()
    assert(rows.length == 50)
    assert(rows.forall { case (_, b) => b >= 0 && b < (1L << 16) })
    // near-dup path at the same shape completes with capped buckets
    val nd = Similarity.nearDupByEmbedding(
      vecs.withColumn("embedding",
        expr(s"transform(embedding, x -> cast(x + 0.0 as float))")),
      threshold = 0.999, planes = 16, dims = dims)
    assert(nd.count() >= 0)
  }

  test("multimodal: asset schema, metadata fast path, stub decode shape") {
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text", "image")
    assert(assets.schema.fieldNames.toSeq ==
      Multimodal.assetSchema.fieldNames.toSeq)
    val insp = Multimodal.inspect(assets)
    val row = insp.filter(col("asset_id") === 1).head()
    assert(row.getAs[Long]("byte_len") == docs.filter(col("doc_id") === 1)
      .select(length(col("text"))).as[Int].head().toLong)
    val feats = Multimodal.decodeStub(assets, featureDim = 4)
    assert(feats.schema == Multimodal.featureSchema.copy())
    val f = feats.filter(col("asset_id") === 1).head()
    assert(f.getAs[Int]("width") >= 16 && f.getAs[Int]("width") < 80)
    assert(f.getSeq[Float](f.fieldIndex("feature")).length == 4)
    // deterministic: same payload -> same fake features
    val again = Multimodal.decodeStub(assets, featureDim = 4)
      .filter(col("asset_id") === 1).head()
    assert(again.getAs[Int]("width") == f.getAs[Int]("width"))
  }

  test("frameSample: every k-th frame index from metadata only") {
    val feats = Seq((1L, "video", 10, 10, 7, Seq(0f))).toDF(
      "asset_id", "media_type", "width", "height", "n_frames", "feature")
    val r = Multimodal.frameSample(feats, 3).select("frame_idx")
      .as[Int].collect().sorted
    assert(r.sameElements(Array(0, 3, 6)))
  }

  test("packChunks: spans cover every token once, straddles split correctly") {
    // doc 1: 3 tokens, doc 2: 4 tokens, doc 3: 2 tokens; chunk = 4
    // stream: [1 1 1 2][2 2 2 3][3]
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis
      .packChunks(docs, "doc_id", "text", 4L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 3L), (2L, 0L, 1L), (2L, 1L, 3L),
      (3L, 1L, 1L), (3L, 2L, 1L)), s"got $out")
    // conservation: per-doc span sums equal the doc's token count
    val sums = out.groupBy(_._1).view.mapValues(_.toSeq.map(_._3).sum).toMap
    assert(sums == Map(1L -> 3L, 2L -> 4L, 3L -> 2L))
  }

  test("native SignSketch matches the declarative plane fold bit-for-bit") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, (0 until 64).map(d =>
        ((i * 31 + d * 7) % 97) / 97.0f - 0.5f))).toDF("vec_id", "embedding")
    // declarative reference: the original aggregate/zip_with fold
    import org.apache.spark.sql.functions.{aggregate => agg_, _}
    def declBand(b: Int, r: Int): Column = {
      val mat = typedLit(graft.pipeline.Similarity.planeMatrixSlice(b * r, r, 64))
      val pIdx = sequence(lit(0), lit(r - 1))
      agg_(zip_with(mat, pIdx, (plane, p) =>
        when(agg_(zip_with(col("embedding"), plane,
                (x, h) => x.cast("double") * h),
              lit(0.0), (acc, v) => acc + v) >= 0,
          pow(lit(2.0), p.cast("double")).cast("long")).otherwise(lit(0L))),
        lit(0L), (acc, bit) => acc + bit)
    }
    val got = vecs.select(col("vec_id"),
        graft.functions.SignSketch.bandSignatures(col("embedding"), 3, 12, 64).as("sig"),
        array(declBand(0, 12), declBand(1, 12), declBand(2, 12)).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"vec ${r.getLong(0)}")
    }
  }

  test("native cosine matches the declarative fold bit-for-bit") {
    val df = (0 until 30).map { i =>
      val a = (0 until 16).map(d => ((i * 13 + d * 5) % 89) / 89.0f)
      val b = (0 until 16).map(d => ((i * 7 + d * 11) % 83) / 83.0f)
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
    import org.apache.spark.sql.functions.{aggregate => agg_, _}
    val declDot = agg_(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    def n2(c: Column) = sqrt(agg_(c, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    val rows = df.select(
      graft.functions.CosineSim(col("a"), col("b")).as("nat"),
      (declDot / (n2(col("a")) * n2(col("b")))).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // null semantics: length mismatch -> null
    val mm = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(graft.functions.CosineSim(col("a"), col("b")).as("s")).head()
    assert(mm.isNullAt(0))
  }
}

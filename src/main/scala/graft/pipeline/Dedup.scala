package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Ckpt.MatOps

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup = hash-groupBy: ONE shuffle on a 32-char key, with
  *    map-side partial aggregation; never compares documents pairwise.
  *  - near-dup = MinHash signatures (per-row map work) → LSH banding →
  *    groupBy(band, bandHash) → pairs generated ONLY within buckets.
  *    All-pairs crossJoin never appears; worst-case cost is bounded by
  *    `maxBucket`: buckets above it (a degenerate band — e.g. empty
  *    docs all sharing one signature) are dropped before the self-join
  *    rather than pinning one reducer with quadratic pairs. Degenerate
  *    identical docs are exactDedup's job anyway.
  *  - verification joins docs back by id to compute true Jaccard on the
  *    candidate pairs only.
  *
  * All hashes are md5-based: deterministic across runs, engines, and
  * the DuckDB oracle. MinHash uses the md5 *string* minimum — min over
  * uniformly-distributed hex strings is as good a permutation-min as an
  * integer hash, and every engine collates ASCII hex identically.
  */
object Dedup {

  import TextAnalysis.{normalize, shingles}

  /** Exact dedup: canonical-normalize → md5 → keep the lowest doc id
    * per hash. Returns (dedup_hash, keep_id, dup_count). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(md5(normalize(col(textCol))).as("dedup_hash"), col(idCol))
      .groupBy("dedup_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature from an ALREADY-MATERIALIZED shingle-array
    * column: perm k's value = min over shingles of md5(k||':'||shingle).
    * Pure per-row map work (array expressions, no UDF, no shuffle).
    *
    * Callers must materialize the shingle array first (see lshBands):
    * if the shingle expression is still inline, Catalyst's
    * CollapseProject re-inlines it into every one of the `numHashes`
    * min-computations and the tokenize/shingle work runs numHashes×
    * per row (measured 100s → 8s at sf0.1 for 16 hashes). */
  /** Mersenne prime 2^31-1: the modulus of the permutation family.
    * All products stay < 2^62, so 64-bit arithmetic never overflows in
    * either engine (DuckDB checks BIGINT overflow; Spark wraps). */
  val MinhashP = 2147483647L

  /** Multiplier / offset of permutation k: fixed odd-multiplier
    * constants (Knuth 2654435761) reduced mod P — deterministic, so
    * the DuckDB oracle embeds the same literals. */
  def permA(k: Int): Long = ((2L * k + 1L) * 2654435761L) % MinhashP
  def permB(k: Int): Long = ((k.toLong + 1L) * 40503L * 65537L + 12345L) % MinhashP

  def minhashSignature(shingleArr: Column, numHashes: Int): Column = {
    // Broder-style universal-hash MinHash: ONE md5 per shingle (the
    // dominant cost — the old form hashed each shingle numHashes×),
    // base h = top 60 bits of the md5 reduced mod P, and permutation
    // k's value = (A_k·h + B_k) mod P. One aggregate traversal keeps
    // all numHashes running minima at once (the simhash16 pattern).
    val base = transform(shingleArr, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashP)
    aggregate(
      base,
      array_repeat(lit(MinhashP), numHashes),
      (acc, h) => zip_with(acc,
        array((0 until numHashes).map(k =>
          (lit(permA(k)) * h + lit(permB(k))) % MinhashP): _*),
        (a, v) => least(a, v)),
      // empty shingle array → all-null signature (matches the old
      // array_min(empty) = NULL behavior); P itself is unreachable
      // since every real value is strictly < P
      acc => transform(acc, x => when(x =!= MinhashP, x)))
  }

  /** LSH banding: signature rows → (id, band, band_hash) rows, one per
    * band; band_hash = md5 of the band's slice of the signature. Docs
    * agreeing on ANY band's hash become candidates. */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
               numHashes: Int, bands: Int, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    // materialize (id, shingles) so the 16 hash-mins read a stored
    // array instead of re-deriving it (plan barrier vs CollapseProject)
    val shingled = docs.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"))
      .mat()
    shingled.select(col("id"),
        minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("id"), explode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            md5(array_join(transform(
                slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
                _.cast("string")), "|"))
              .as("band_hash")))).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
  }

  /** Candidate near-dup pairs via LSH: bucket-local self-join (a < b),
    * deduped across bands. The join key (band, band_hash) makes this a
    * co-partitioned equi-join — never an all-pairs product. */
  def lshCandidatePairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", numHashes: Int = 16,
                        bands: Int = 4, shingleN: Int = 3,
                        maxBucket: Int = Similarity.MaxBucketRows): DataFrame = {
    // materialize the band table ONCE — the signature (16 md5s per
    // shingle) is the expensive map stage, and the self-join would
    // otherwise recompute it for both sides
    val b = Similarity.capBuckets(
        lshBands(docs, idCol, textCol, numHashes, bands, shingleN),
        Seq("band", "band_hash"), maxBucket)
      .mat()
    val l = b.select(col("band"), col("band_hash"), col("id").as("a"))
    val r = b.select(col("band"), col("band_hash"), col("id").as("b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** True Jaccard similarity on distinct word shingles for given id
    * pairs — the verification step after LSH blocking. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleN: Int = 3): DataFrame = {
    // shingle lists are joined twice (a-side and b-side) — compute once
    val sh = docs.select(col(idCol).as("__id"),
      array_distinct(shingles(col(textCol), shingleN)).as("__sh"))
      .mat()
    pairs
      .join(sh.withColumnRenamed("__id", "a").withColumnRenamed("__sh", "sha"), Seq("a"))
      .join(sh.withColumnRenamed("__id", "b").withColumnRenamed("__sh", "shb"), Seq("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double")).as("jaccard"))
  }

  /** Near-dup pairs above a Jaccard threshold: LSH blocking + verify.
    * The shingle arrays are computed ONCE and shared by the signature
    * stage and the verification joins. */
  def nearDupPairs(docs: DataFrame, threshold: Double,
                   idCol: String = "doc_id", textCol: String = "text",
                   numHashes: Int = 16, bands: Int = 4,
                   shingleN: Int = 3,
                   maxBucket: Int = Similarity.MaxBucketRows): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val shingled = docs.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"))
      .mat()
    val b = Similarity.capBuckets(shingled
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("id"), explode(
        transform(sequence(lit(0), lit(bands - 1)),
          bd => struct(bd.as("band"),
            md5(array_join(transform(
                slice(col("sig"), bd * rowsPerBand + 1, lit(rowsPerBand)),
                _.cast("string")), "|"))
              .as("band_hash")))).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.band_hash").as("band_hash")),
      Seq("band", "band_hash"), maxBucket)
      .mat()
    val cands = b.select(col("band"), col("band_hash"), col("id").as("a"))
      .join(b.select(col("band"), col("band_hash"), col("id").as("b")),
        Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    cands
      .join(shingled.withColumnRenamed("id", "a").withColumnRenamed("sh", "sha"), Seq("a"))
      .join(shingled.withColumnRenamed("id", "b").withColumnRenamed("sh", "shb"), Seq("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 16-bit SimHash over whitespace tokens. Bit j of the sketch is the
    * sign of Σ_tokens (±1), where token t votes +1 on bit j iff hex
    * digit j of md5(t) is ≥ 8 (the digit's high bit). Hamming distance
    * between sketches ≈ cosine distance between token multisets.
    * Deterministic; the oracle replays it digit by digit. */
  def simhash16(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val hashes = transform(toks, t => md5(t))
    val idx = sequence(lit(0), lit(15))
    // one pass over the token hashes building all 16 vote counters at
    // once (referencing `hashes` once keeps the tokenize+md5 work from
    // being re-inlined per bit by CollapseProject)
    val votes = aggregate(hashes, transform(idx, _ => lit(0)),
      (acc, h) => zip_with(acc, idx, (a, j) =>
        // hex digit j ≥ '8' ⇔ high bit set (digits are 0-9a-f)
        a + when(h.substr(j + lit(1), lit(1)) >= "8", 1).otherwise(-1)))
    aggregate(
      zip_with(votes, idx, (v, j) =>
        when(v > 0, pow(lit(2.0), (lit(15) - j).cast("double")).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two long-encoded sketches (for simhash
    * bucketing / near-dup by bit distance). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** End-to-end near-dup DEDUP — the step a training-data pipeline
    * actually ships (candidate pairs alone don't dedup anything):
    * MinHash-LSH verified pairs → connected components over the pair
    * graph (transitive closure: A≈B≈C collapse together even when
    * A,C never paired) → survivor = min doc_id per cluster. Output
    * (doc_id, keep_id); keep rows where doc_id == keep_id.
    *
    * `ccIters` label-propagation rounds bound the cluster diameter
    * handled; near-dup chains are short, and the oracle replays the
    * same fixed round count so unconverged labels still compare
    * equal. One shuffle per round on doc_id — same scale posture as
    * GraphAlgos.connectedComponents. */
  def dedupClusters(docs: DataFrame, threshold: Double,
                    idCol: String = "doc_id", textCol: String = "text",
                    ccIters: Int = 4): DataFrame = {
    val pairs = nearDupPairs(docs, threshold, idCol, textCol)
    val verts = docs.select(col(idCol).as("vid"))
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
    graft.algo.GraphAlgos.connectedComponents(verts, edges, ccIters)
      .select(col("vid").as(idCol), col("label").as("keep_id"))
  }
}

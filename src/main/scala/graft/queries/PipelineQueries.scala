package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis => TA}
import graft.functions.Fn.roundPortable

/** SparkEntry registrations for the LLM-training-data pipeline pack:
  * dedup (exact / MinHash-LSH / SimHash), text analysis (language-ID,
  * quality, token counting, fingerprinting), embedding similarity
  * (brute-force + LSH ANN), and multimodal column plumbing.
  *
  * Every oracle replays the EXACT algorithm in DuckDB SQL (md5-based
  * hashing makes them engine-portable) — including the LSH bucketing,
  * so the oracle checks the approximate path's real output, not just a
  * ground-truth superset. */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // exact dedup: normalize → md5 → hash-groupBy (one shuffle, no pairs)
    "q_dedup_exact" -> ((s, dir) => Dedup.exactDedup(t(s, dir, "documents"))),

    // quality-scoring feature block (Gopher/C4-style filters)
    "q_text_quality" -> ((s, dir) =>
      TA.qualityFeatures(t(s, dir, "documents")).select(
        col("doc_id"), col("n_tokens"),
        roundPortable(col("avg_token_len"), 4).as("avg_token_len"),
        roundPortable(col("punct_ratio"), 4).as("punct_ratio"),
        roundPortable(col("stopword_ratio"), 4).as("stopword_ratio"),
        roundPortable(col("upper_ratio"), 4).as("upper_ratio"))),

    // language-ID (stopword-list argmax heuristic)
    "q_lang_id" -> ((s, dir) =>
      TA.languageId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("lang_pred"))),

    // token counting: whitespace + BPE-ish pre-tokenizer regex
    "q_token_counts" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TA.tokenCount(col("text")).as("ws_tokens"),
        TA.bpeishCount(col("text")).as("bpeish"))),

    // rolling-hash fingerprint (min 5-gram shingle md5)
    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TA.fingerprint(col("text")).as("fp"))),

    // concat-and-chunk sequence packing (512-token chunks): the
    // (doc, chunk) span manifest a pretraining data loader reads
    "q_pack_chunks" -> ((s, dir) =>
      TA.packChunks(t(s, dir, "documents"), "doc_id", "text", 512L)),

    // benchmark decontamination: flag corpus docs sharing any word
    // 8-gram with the "eval set" (here: every 50th doc plays the
    // benchmark) — broadcast deny-list, one corpus pass, map-side hit
    // detection (Decontaminate.scala)
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.pipeline.Decontaminate.contaminationHits(
        docs, docs.filter(pmod(col("doc_id"), lit(50)) === 0), 8)
    }),

    // MinHash(16) + LSH(4 bands) near-dup pairs, Jaccard-verified ≥ 0.8
    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.nearDupPairs(t(s, dir, "documents"), 0.8)
        .select(col("a"), col("b"), roundPortable(col("jaccard"), 6).as("jaccard"))),

    // end-to-end near-dup dedup: verified pairs → connected
    // components → survivor = min doc_id per cluster
    "q_dedup_clusters" -> ((s, dir) =>
      Dedup.dedupClusters(t(s, dir, "documents"), 0.8)),

    // 16-bit SimHash sketch per document
    "q_simhash" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        Dedup.simhash16(col("text")).as("sketch"))),

    // brute-force cosine top-10 for 5 query vectors (exact baseline)
    "q_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(emb, queries, 10)
        .select(col("query_id"), col("vec_id"),
          roundPortable(col("sim"), 6).as("sim"), col("rnk"))
    }),

    // LSH-bucketed ANN top-10 (the scale path; oracle replays buckets)
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Similarity.lshTopK(emb, queries, 10, planes = 4, dims = 64)
        .select(col("query_id"), col("vec_id"),
          roundPortable(col("sim"), 6).as("sim"), col("rnk"))
    }),

    // IVF ANN top-10 (inverted-file cells; deterministic centroid
    // model = 16 lowest-id vectors, nprobe=2)
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.ivfFitDeterministic(emb, 16)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Similarity.ivfTopK(emb, queries, 10, cents, nprobe = 2)
        .select(col("query_id"), col("vec_id"),
          roundPortable(col("sim"), 6).as("sim"), col("rnk"))
    }),

    // embedding-cosine near-dup pairs, BANDED sign-LSH (OR-amplified:
    // 4 bands × 12 planes — per-band buckets stay ~N/4096 so the
    // within-bucket pairing is near-linear; the old single-table
    // planes=4 form was 2.2 s at sf0.1 but 279 s at sf1)
    "q_embed_neardup" -> ((s, dir) =>
      Similarity.nearDupByEmbeddingBanded(t(s, dir, "embeddings"), 0.35,
          bands = 4, planesPerBand = 12, dims = 64)
        .select(col("a"), col("b"), roundPortable(col("sim"), 6).as("sim"))),

    // multimodal: metadata inspection w/o decode (payload col pruned)
    "q_mm_inspect" -> ((s, dir) =>
      Multimodal.inspect(
        Multimodal.assetsFromText(t(s, dir, "documents"), "doc_id", "text", "image"))),

    // multimodal: stub decode (deterministic fake codec, real plumbing)
    "q_mm_decode" -> ((s, dir) =>
      Multimodal.decodeStub(
          Multimodal.assetsFromText(t(s, dir, "documents"), "doc_id", "text", "image"))
        .select(col("asset_id"), col("media_type"), col("width"),
          col("height"), col("n_frames"))),

    // fulltext: BM25 match query top-k (at-scale twin of ES_QUERY)
    "q_fulltext_search" -> ((s, dir) =>
      graft.pipeline.FulltextSearch.bm25TopK(
        t(s, dir, "documents"), "doc_id", "text", "hash join merge", 20))
  )

  // ---- oracle SQL ----

  /** DuckDB twin of TextAnalysis.normalize. */
  private val norm =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  /** tokens CTE fragment: (doc_id, lang, text, toks). */
  private val tkCte =
    s"tk AS (SELECT doc_id, lang, text, string_split($norm, ' ') AS toks FROM documents)"

  /** DuckDB twin of TextAnalysis.shingles(text, n) over toks. */
  private def shinglesSql(n: Int): String =
    s"""CASE WHEN len(toks) >= $n
       |  THEN list_transform(range(1, len(toks) - ${n - 2}), i -> array_to_string(toks[i:i+${n - 1}], ' '))
       |  ELSE [$norm] END""".stripMargin

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  private val langScoresSql: String =
    TA.langWords.toSeq.sortBy(_._1).map { case (code, words) =>
      s"SELECT doc_id, '$code' AS code, len(list_filter(toks, x -> x IN ${inList(words)})) AS sc FROM tk"
    }.mkString("\nUNION ALL ")

  /** ±1 hyperplane literal for ANN plane p (mirrors Similarity.planeSign). */
  private def signsLiteral(p: Int, dims: Int): String =
    (0 until dims).map(d => Similarity.planeSign(p, d))
      .map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** bucket expression over a DOUBLE[] column `v`. */
  private def bucketSql(v: String, planes: Int, dims: Int): String =
    (0 until planes).map { p =>
      s"(CASE WHEN list_dot_product($v, ${signsLiteral(p, dims)}) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** band-signature expression: planes `from .. from+r-1`, bit p-from
    * (mirrors Similarity.bandSignatures band slicing). */
  private def bucketSqlSlice(v: String, from: Int, r: Int, dims: Int): String =
    (0 until r).map { i =>
      s"(CASE WHEN list_dot_product($v, ${signsLiteral(from + i, dims)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** MinHash permutation constants as DuckDB list literals — emitted
    * from the SAME Dedup.permA/permB the Spark plan uses, so the two
    * engines can never drift. */
  private val permALiteral: String =
    (0 until 16).map(Dedup.permA).mkString("[", ", ", "]")
  private val permBLiteral: String =
    (0 until 16).map(Dedup.permB).mkString("[", ", ", "]")

  private def cosExpr(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** MinHash-LSH candidate CTE chain (sh → sig → bands → cand),
    * shared by the q_minhash_pairs and q_dedup_clusters oracles. */
  private val minhashCandCtes: String =
    s"""sh AS (SELECT doc_id, list_distinct(${shinglesSql(3)}) AS s FROM tk),
       |sig AS (SELECT doc_id, s,
       |          list_transform(range(0, 16), k -> list_aggregate(list_transform(s, x -> ((${permALiteral})[k + 1] * (('0x' || substr(md5(x), 1, 15))::BIGINT % ${Dedup.MinhashP}) + (${permBLiteral})[k + 1]) % ${Dedup.MinhashP}), 'min')) AS sig
       |        FROM sh),
       |bands0 AS (SELECT doc_id, b.band AS band,
       |            md5(array_to_string(sig[b.band * 4 + 1:b.band * 4 + 4], '|')) AS band_hash
       |          FROM sig, (SELECT unnest(range(0, 4)) AS band) b),
       |bands AS (SELECT doc_id, band, band_hash FROM bands0
       |          QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= ${Similarity.MaxBucketRows}),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_fulltext_search" ->
      graft.pipeline.FulltextSearch.oracleSql("hash join merge", 20),
    "q_dedup_exact" ->
      s"""SELECT md5($norm) AS dedup_hash, min(doc_id) AS keep_id, count(*) AS dup_count
         |FROM documents GROUP BY 1""".stripMargin,
    "q_text_quality" ->
      s"""WITH $tkCte
         |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
         |  floor((CASE WHEN len(toks) > 0
         |    THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
         |    ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS avg_token_len,
         |  floor(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / greatest(length(text), 1) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
         |  floor(CAST(len(list_filter(toks, x -> x IN ${inList(TA.stopwords)})) AS DOUBLE) / greatest(len(toks), 1) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio,
         |  floor(CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) / greatest(length(text), 1) * 10000.0 + 0.5) / 10000.0 AS upper_ratio
         |FROM tk""".stripMargin,
    "q_lang_id" ->
      s"""WITH $tkCte,
         |scores AS ($langScoresSql),
         |best AS (SELECT doc_id, code, sc,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, code DESC) AS rn
         |         FROM scores)
         |SELECT t.doc_id, t.lang, CASE WHEN b.sc > 0 THEN b.code ELSE 'und' END AS lang_pred
         |FROM tk t JOIN best b ON b.doc_id = t.doc_id AND b.rn = 1""".stripMargin,
    "q_token_counts" ->
      s"""WITH $tkCte
         |SELECT doc_id, CAST(len(toks) AS INTEGER) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS bpeish
         |FROM tk""".stripMargin,
    "q_fingerprint" ->
      s"""WITH $tkCte
         |SELECT doc_id, list_aggregate(list_transform(${shinglesSql(5)}, s -> md5(s)), 'min') AS fp
         |FROM tk""".stripMargin,
    "q_decontaminate" ->
      s"""WITH $tkCte,
         |bg AS (SELECT DISTINCT unnest(${shinglesSql(8)}) AS g
         |       FROM tk WHERE doc_id % 50 = 0),
         |cg AS (SELECT DISTINCT doc_id, unnest(${shinglesSql(8)}) AS g
         |       FROM tk)
         |SELECT c.doc_id, count(*) AS n_bad_grams, min(c.g) AS first_gram
         |FROM cg c JOIN bg ON c.g = bg.g
         |GROUP BY c.doc_id""".stripMargin,
    "q_pack_chunks" ->
      s"""WITH $tkCte,
         |t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS tokens FROM tk),
         |c AS (SELECT doc_id, tokens,
         |        CAST(sum(tokens) OVER (ORDER BY doc_id
         |                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |          AS cum_end
         |      FROM t),
         |s AS (SELECT doc_id, tokens, cum_end, cum_end - tokens AS cum_start
         |      FROM c WHERE tokens > 0)
         |SELECT doc_id, bin,
         |  least(cum_end, (bin + 1) * 512) - greatest(cum_start, bin * 512)
         |    AS tokens_in_bin
         |FROM (SELECT doc_id, cum_start, cum_end,
         |        UNNEST(range(cum_start // 512, (cum_end - 1) // 512 + 1)) AS bin
         |      FROM s)""".stripMargin,
    "q_minhash_pairs" ->
      s"""WITH $tkCte,
         |$minhashCandCtes
         |SELECT c.a, c.b,
         |  floor(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / len(list_distinct(sa.s || sb.s)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
         |FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
         |WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / len(list_distinct(sa.s || sb.s)) >= 0.8""".stripMargin,
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $tkCte,
         |$minhashCandCtes,
         |pairs AS (SELECT c.a, c.b
         |          FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
         |          WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / len(list_distinct(sa.s || sb.s)) >= 0.8),
         |UE AS (SELECT a AS src, b AS dst FROM pairs
         |       UNION ALL SELECT b, a FROM pairs
         |       UNION ALL SELECT doc_id, doc_id FROM documents),
         |lp(iter, vid, label) AS (
         |  SELECT 0, doc_id, doc_id FROM documents
         |  UNION ALL
         |  SELECT lp.iter + 1, ue.dst, min(lp.label)
         |  FROM lp JOIN UE ue ON ue.src = lp.vid
         |  WHERE lp.iter < 4
         |  GROUP BY lp.iter + 1, ue.dst)
         |SELECT vid AS doc_id, label AS keep_id FROM lp WHERE iter = 4""".stripMargin,
    "q_simhash" ->
      s"""WITH $tkCte,
         |v AS (SELECT doc_id, j,
         |        list_sum(list_transform(toks, x -> CASE WHEN substr(md5(x), CAST(j + 1 AS INTEGER), 1) >= '8' THEN 1 ELSE -1 END)) AS votes
         |      FROM tk, (SELECT unnest(range(0, 16)) AS j) jj)
         |SELECT doc_id, CAST(sum(CASE WHEN votes > 0 THEN 1 << CAST(15 - j AS INTEGER) ELSE 0 END) AS BIGINT) AS sketch
         |FROM v GROUP BY doc_id""".stripMargin,
    "q_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |sims AS (SELECT q.query_id, c.vec_id, ${cosExpr("c.cv", "q.qv")} AS sim FROM c CROSS JOIN q),
         |rk AS (SELECT query_id, vec_id, sim,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
         |       FROM sims)
         |SELECT query_id, vec_id, floor(sim * 1000000.0 + 0.5) / 1000000.0 AS sim, rnk FROM rk WHERE rnk <= 10""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
         |             ${bucketSql("embedding::DOUBLE[]", 4, 64)} AS bucket
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv,
         |        ${bucketSql("embedding::DOUBLE[]", 4, 64)} AS bucket
         |      FROM embeddings),
         |sims AS (SELECT q.query_id, c.vec_id, ${cosExpr("c.cv", "q.qv")} AS sim
         |         FROM c JOIN q ON c.bucket = q.bucket),
         |rk AS (SELECT query_id, vec_id, sim,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
         |       FROM sims)
         |SELECT query_id, vec_id, floor(sim * 1000000.0 + 0.5) / 1000000.0 AS sim, rnk FROM rk WHERE rnk <= 10""".stripMargin,
    "q_ann_ivf" ->
      s"""WITH cent AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS tv
         |              FROM embeddings WHERE vec_id < 16),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |cassign AS (SELECT vec_id, cv, cell FROM (
         |    SELECT c.vec_id, c.cv, t.cell,
         |           row_number() OVER (PARTITION BY c.vec_id
         |             ORDER BY ${cosExpr("c.cv", "t.tv")} DESC, t.cell) AS rn
         |    FROM c CROSS JOIN cent t) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |      FROM embeddings WHERE vec_id < 5),
         |qprobe AS (SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, t.cell,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY ${cosExpr("q.qv", "t.tv")} DESC, t.cell) AS rn
         |    FROM q CROSS JOIN cent t) WHERE rn <= 2),
         |sims AS (SELECT p.query_id, a.vec_id, ${cosExpr("a.cv", "p.qv")} AS sim
         |         FROM cassign a JOIN qprobe p ON a.cell = p.cell),
         |rk AS (SELECT query_id, vec_id, sim,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
         |       FROM sims)
         |SELECT query_id, vec_id, floor(sim * 1000000.0 + 0.5) / 1000000.0 AS sim, rnk FROM rk WHERE rnk <= 10""".stripMargin,
    "q_embed_neardup" ->
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |b0 AS (${(0 until 4).map(bd =>
             s"SELECT vec_id, cv, $bd AS band, ${bucketSqlSlice("cv", bd * 12, 12, 64)} AS bucket FROM c")
             .mkString("\n  UNION ALL ")}),
         |b AS (SELECT vec_id, cv, band, bucket FROM b0
         |      QUALIFY count(*) OVER (PARTITION BY band, bucket) <= ${Similarity.MaxBucketRows})
         |SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
         |  floor((${cosExpr("x.cv", "y.cv")}) * 1000000.0 + 0.5) / 1000000.0 AS sim
         |FROM b x JOIN b y ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE ${cosExpr("x.cv", "y.cv")} >= 0.35""".stripMargin,
    "q_mm_inspect" ->
      """SELECT doc_id AS asset_id, 'image' AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  lower(hex(encode(substr(text, 1, 4)))) AS magic_hex,
        |  md5(text) AS payload_md5
        |FROM documents""".stripMargin,
    "q_mm_decode" ->
      """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
        |b AS (SELECT doc_id,
        |        (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1 AS b0,
        |        (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(hx, 4, 1)) - 1 AS b1
        |      FROM h)
        |SELECT doc_id AS asset_id, 'image' AS media_type,
        |  CAST(16 + b0 % 64 AS INTEGER) AS width,
        |  CAST(16 + b1 % 64 AS INTEGER) AS height,
        |  CAST(1 AS INTEGER) AS n_frames
        |FROM b""".stripMargin
  )
}

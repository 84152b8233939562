package graft.nql

/** Native re-expression of the reference's Elasticsearch fulltext
  * surface — CREATE FULLTEXT INDEX / ES_QUERY / score() — with a
  * deterministic analyzer and BM25 scoring that reproduces the TCK
  * goldens (recorded from a real ES cluster) bit-for-bit.
  *
  * Reference surface:
  *  - tests/tck/features/fulltext_index/ (goldens)
  *  - src/graph/validator/LookupValidator.cpp (ES_QUERY routing)
  *  - src/common/plugin/fulltext/elasticsearch/ESAdapter.cpp (query)
  *
  * The scoring re-derives the PUBLISHED Lucene-8 BM25 model (k1=1.2,
  * b=0.75): idf = ln(1+(N-df+.5)/(df+.5)), score = w - w/(1+tf·inv)
  * with w = (k1+1)·idf and inv = 1/(k1·(1-b+b·dl/avgdl)), evaluated
  * in float32 at each step exactly as Lucene's BM25Scorer caches do,
  * including the SmallFloat int4 doc-length encoding (exact to 40,
  * 3-bit mantissa above). No ES/Lucene source is vendored — this is
  * the textbook formula plus the two documented storage quirks.
  */
object Fulltext {

  private val K1 = 1.2f
  private val B = 0.75f

  /** ES "standard" analyzer re-expression: maximal letter/digit runs
    * lowercased; Han ideographs tokenize one per character (UAX#29
    * gives each Han syllable its own word boundary). */
  def analyze(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val run = new StringBuilder
    def flush(): Unit =
      if (run.nonEmpty) { out += run.toString; run.clear() }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) {
        flush()
        out += new String(Character.toChars(Character.toLowerCase(cp)))
      } else if (Character.isLetterOrDigit(cp)) {
        run.appendAll(Character.toChars(Character.toLowerCase(cp)))
      } else flush()
      i += Character.charCount(cp)
    }
    flush()
    out.result()
  }

  /** Lucene SmallFloat int4 norm round-trip: doc length as stored in
    * a norm byte — exact below 40, 3-bit-mantissa floor above. */
  def normLength(dl: Int): Int = {
    def longToInt4(l: Long): Int = {
      val numBits = 64 - java.lang.Long.numberOfLeadingZeros(l)
      if (numBits < 4) l.toInt
      else {
        val shift = numBits - 4
        (((l >>> shift).toInt & 0x07)) | ((shift + 1) << 3)
      }
    }
    def int4ToLong(i: Int): Long = {
      val bits = (i & 0x07).toLong
      val shift = (i >>> 3) - 1
      if (shift == -1) bits else (bits | 0x08L) << shift
    }
    val maxInt4 = longToInt4(Int.MaxValue)
    val numFree = 255 - maxInt4
    if (dl < numFree) dl
    else (numFree + int4ToLong(longToInt4((dl - numFree).toLong))).toInt
  }

  /** BM25 match over insertion-ordered docs; `docs(d)(f)` is doc d's
    * value for the index's f-th field (None = field absent). Query
    * terms OR together; a doc's score sums matching terms over
    * matching fields. Returns (docIdx, score) sorted score-desc then
    * insertion order — the ES result order the LIMIT goldens cut. */
  def search(docs: IndexedSeq[Seq[Option[String]]],
             query: String): Vector[(Int, Float)] = {
    if (docs.isEmpty) return Vector.empty
    val nFields = docs.head.size
    val qTerms = analyze(query)
    val scores = new Array[Float](docs.size)
    val matched = new Array[Boolean](docs.size)
    var fi = 0
    while (fi < nFields) {
      val fieldToks: IndexedSeq[Option[Vector[String]]] =
        docs.map(_(fi).map(analyze))
      val n = fieldToks.count(_.isDefined)
      if (n > 0) {
        val sumdl = fieldToks.iterator.flatten.map(_.size.toLong).sum
        val avgdl: Float = (sumdl.toDouble / n).toFloat
        qTerms.foreach { term =>
          val df = fieldToks.count(_.exists(_.contains(term)))
          if (df > 0) {
            val idf: Float =
              math.log(1d + (n - df + 0.5d) / (df + 0.5d)).toFloat
            val weight: Float = (K1 + 1f) * idf
            var d = 0
            while (d < docs.size) {
              fieldToks(d) match {
                case Some(toks) =>
                  val tf = toks.count(_ == term)
                  if (tf > 0) {
                    val dl = normLength(toks.size)
                    val inv: Float =
                      1f / (K1 * ((1f - B) + B * dl.toFloat / avgdl))
                    scores(d) += weight - weight / (1f + tf.toFloat * inv)
                    matched(d) = true
                  }
                case None => ()
              }
              d += 1
            }
          }
        }
      }
      fi += 1
    }
    docs.indices.iterator.filter(matched).map(d => d -> scores(d))
      .toVector.sortBy { case (d, s) => (-s.toDouble, d) }
  }
}

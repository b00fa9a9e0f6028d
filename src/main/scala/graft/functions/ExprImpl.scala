package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Dedup

/** Scalar helpers referenced from generated code. MUST remain a TOP-LEVEL
  * object: scalac emits static forwarder methods only for top-level
  * objects, and the Janino-compiled whole-stage code calls these as plain
  * Java statics (`graft.functions.ExprImpl.fnv1a64(...)`).
  */
object ExprImpl {

  def fnv1a64(s: UTF8String): Long = Dedup.fnv1a64(s.toString)

  /** hash_embedding(string, dim) → float[dim]: the deterministic encoder
    * stand-in (component i = remainderUnsigned(mix64(mix64(fnv1a64(text))
    * xor i·0xC2B2AE3D27D4EB4F), 2000001)/10⁶ − 1, as a float) in one
    * primitive loop — fnv+mix once per ROW, one mix64 + unsigned-mod per
    * dimension. The Column HOF formulation interprets the whole hash
    * chain per array element (Spark higher-order functions never enter
    * codegen) and measured ~9 s of the 10 s composed-retrieval entry at
    * sf0.1; this is the production twin, differential-gated bit-identical
    * against the Column form in RetrievalSpec.
    */
  def hashEmbedding(s: UTF8String, dim: Int): ArrayData = {
    val h = Dedup.mix64(Dedup.fnv1a64(s.toString))
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val v = Dedup.mix64(h ^ (i.toLong * 0xC2B2AE3D27D4EB4FL))
      out(i) =
        ((java.lang.Long.remainderUnsigned(v, 2000001L).toDouble / 1000000.0) - 1.0).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** DEFLATE length of the UTF-8 bytes at the given level. Deterministic
    * for a fixed level on the JVM's zlib, which is all the compressibility
    * quality signal needs (the RATIO is the feature; it has no cross-stack
    * oracle, so its catalog entry is rows-only + ScalaTest).
    */
  def deflateLen(s: UTF8String, level: Int): Long = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(level, /*nowrap=*/ true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def simhash64(s: UTF8String): Long = {
    val text = s.toString
    val votes = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { t =>
      if (t.nonEmpty) {
        val h = Dedup.fnv1a64(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val ShingleSep = UTF8String.fromString(" ")

  /** Word n-gram shingle set over a UTF8String, allocation-lean: tokenize
    * by byte-scanning for ASCII whitespace (Java's `\s` class is ASCII-only,
    * and UTF-8 continuation bytes all have the high bit set, so the byte
    * scan is exact for any input), slice token UTF8Strings off one shared
    * byte copy, and join n-grams with `concatWs`. Semantics identical to
    * `Dedup.shingleSet` (split-filter-sliding-distinct, first-occurrence
    * order) — differential-tested in ExpressionsSpec.
    */
  def shingleSet(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = text.getBytes
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
    val tokens = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      val start = i
      while (i < bytes.length && !isWs(bytes(i))) i += 1
      if (i > start) tokens.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    val m = tokens.size()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (m > 0 && m < n) {
      out.add(UTF8String.concatWs(ShingleSep, tokens.toArray(new Array[UTF8String](m)): _*))
    } else if (m > 0) {
      val window = new Array[UTF8String](n)
      var j = 0
      while (j <= m - n) {
        var k = 0
        while (k < n) { window(k) = tokens.get(j + k); k += 1 }
        out.add(UTF8String.concatWs(ShingleSep, window: _*))
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** MinHash signature over a shingle array: min (signed) of hash-family
    * member i per shingle, i < numHashes — the native twin of
    * Dedup.minhashSig, taking ArrayData directly (no Seq bridging).
    */
  def minhashSig(shingles: ArrayData, numHashes: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val h = Dedup.fnv1a64(shingles.getUTF8String(s).toString)
      var i = 0
      while (i < numHashes) {
        val m = Dedup.mix64(h ^ (i.toLong * 0xC2B2AE3D27D4EB4FL))
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  /** Sign-random-projection LSH bucket of a float vector: one bit per
    * hyperplane (dot ≥ 0), planes bits → long bucket id.
    *
    * Plane component (plane p, dim i) is drawn from the same fnv/splitmix64
    * hash family as MinHash (`Dedup.mix64`, member-seed constant
    * 0xC2B2AE3D27D4EB4F): `remainderUnsigned(mix64(mix64(pG) ^ i·C), 2000001)
    * / 1e6 - 1` with pG = family·10007 + p. Chosen over Spark's XxHash64
    * because the mix64 family is re-derived bit-exactly in DuckDB SQL
    * (TextOps.HashSql), which lets the driver oracle the LSH path end to
    * end; `Similarity.lshBucketColumns` is the bit-identical Column
    * formulation kept for differential testing (ExpressionsSpec). Single
    * pass per plane with the per-plane seed hoisted.
    */
  /** The per-plane hyperplane dots shared by lshBucket and lshProbes —
    * ONE maintained copy of the seed chain / modulus / scaling, so the
    * `lshProbes(v, p, f, 1)(0) == lshBucket(v, p, f)` invariant the
    * bucketing joins rely on cannot drift. Returns null when any element
    * is null (the Column formulation's poison semantics).
    */
  private def planeDots(vec: ArrayData, planes: Int, family: Int): Array[Double] = {
    val n = vec.numElements()
    var k = 0
    while (k < n) {
      if (vec.isNullAt(k)) return null
      k += 1
    }
    val dots = new Array[Double](planes)
    var p = 0
    while (p < planes) {
      val planeSeed = Dedup.mix64((family * 10007 + p).toLong)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val h = Dedup.mix64(planeSeed ^ (i.toLong * 0xC2B2AE3D27D4EB4FL))
        val m = java.lang.Long.remainderUnsigned(h, 2000001L)
        dot += vec.getFloat(i).toDouble * (m.toDouble / 1000000.0 - 1.0)
        i += 1
      }
      dots(p) = dot
      p += 1
    }
    dots
  }

  private def signBucket(dots: Array[Double]): Long = {
    var bucket = 0L
    var p = 0
    while (p < dots.length) {
      if (dots(p) >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def lshBucket(vec: ArrayData, planes: Int, family: Int): Long = {
    // null element semantics match the Column formulation: any null poisons
    // every plane's dot (null >= 0 is false) → bucket 0
    val dots = planeDots(vec, planes, family)
    if (dots == null) 0L else signBucket(dots)
  }

  /** Dot product of two float vectors in double precision, left-to-right
    * accumulation — bit-identical to the Column form
    * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` (same fp order),
    * but one primitive loop with ZERO per-pair allocations where the Column
    * form materializes an intermediate array per evaluation — the measured
    * difference between a 63 s and a ~3 s exact all-pairs pass at sf0.1.
    * Null semantics mirror the Column form: ragged lengths or a null
    * element → null (zip_with pads with null, null poisons the sum).
    */
  def dotF32(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Left-to-right sum of struct field `idx` (double) over an array —
    * the ordered-fold kernel behind every oracle-mode deterministic sum
    * (BM25 score, PageRank inflow, DSIR/LM folds, entropy). The call
    * sites feed it `array_sort(collect_list(struct(key, value)))`, so the
    * accumulation order is the sort order: bit-identical to the
    * `aggregate(transform(...))` Column HOF it replaces (which ran
    * interpreted per element — HOF lambdas never enter codegen) and to
    * DuckDB's `list_sum(list(v ORDER BY k))`. Null element or null field
    * poisons to null, matching the HOF's acc + NULL semantics; empty
    * array → 0.0 (the fold's init).
    */
  def foldSumField(arr: ArrayData, idx: Int, numFields: Int): java.lang.Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val row = arr.getStruct(i, numFields)
      if (row.isNullAt(idx)) return null
      s += row.getDouble(idx)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Σ aᵢ·bᵢ over two int arrays as a long — the int8-quantized scoring
    * kernel (|q| ≤ 127 ⇒ products ≤ 16129; long sum overflow-safe to dim
    * ~5.7e14). Exact integer arithmetic: no fp-order caveats. Ragged
    * lengths or null elements → null, mirroring the zip_with Column form
    * (kept as Similarity.intDotColumns, the differential baseline).
    */
  def dotI32(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  private val combiningMarks = java.util.regex.Pattern.compile("\\p{M}+")

  /** ALL word n-gram occurrences in order (non-distinct — the frequency
    * counters' input, where `shingleSet` is the dedup family's distinct
    * variant): tokens split on whitespace, each window of n joined by one
    * space; fewer than n tokens → empty. One primitive pass; the Column
    * formulation (transform + element_at over a filter(split(..)) array)
    * re-evaluates the split per element access after CollapseProject
    * inlines the alias — measured 7.4 s vs 0.4 s for the sf0.1 bigram
    * count on this exact shape.
    */
  def ngrams(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ts = s.toString.split("\\s+").filter(_.nonEmpty)
    if (ts.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[UTF8String])
    val out = new Array[UTF8String](ts.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ts(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** fnv1a64 of every w-token window string, one primitive pass: equals
    * fnv1a64(tokens[i] + " " + … + tokens[i+w−1]) at each position without
    * materializing the window strings (the chars stream straight through
    * the hash, separator included) — and, as one expression, immune to the
    * CollapseProject re-evaluation hazard a transform/slice/concat_ws
    * composition over an aliased token array hits (see `ngrams`).
    */
  def windowHashes(s: UTF8String, w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ts = s.toString.split("\\s+").filter(_.nonEmpty)
    if (ts.length < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](ts.length - w + 1)
    var i = 0
    while (i < out.length) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < w) {
        if (j > 0) { h ^= ' '; h *= 0x100000001b3L }
        val t = ts(i + j)
        var c = 0
        while (c < t.length) {
          h ^= t.charAt(c)
          h *= 0x100000001b3L
          c += 1
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val normForms = Array(java.text.Normalizer.Form.NFC,
    java.text.Normalizer.Form.NFD, java.text.Normalizer.Form.NFKC,
    java.text.Normalizer.Form.NFKD)

  /** Unicode normalization (java.text.Normalizer). `form` indexes
    * NFC/NFD/NFKC/NFKD (0-3) — an int, not the enum, because the generated
    * whole-stage Java calls this as a plain static and Janino handles
    * primitive literals more robustly than enum constant references. The
    * index is baked in at plan time by the Expression, never varies per
    * row. UTF8String round-trips through java.lang.String because the
    * normalization tables live there.
    */
  def normalizeText(s: UTF8String, form: Int): UTF8String = {
    val str = s.toString
    // isNormalized runs the quick-check pass only (YES on pure ASCII and
    // most already-composed text) — skips the normalize table walk.
    // BOTH paths still round-trip through String: returning the raw
    // UTF8String buffer would skip the invalid-byte → U+FFFD laundering
    // the toString/fromString round-trip performs, and identical dirty
    // docs would then hash differently depending on unrelated content
    // (the fingerprint/dedup keys must see ONE byte representation).
    if (java.text.Normalizer.isNormalized(str, normForms(form)))
      UTF8String.fromString(str)
    else UTF8String.fromString(java.text.Normalizer.normalize(str, normForms(form)))
  }

  // \s of the Column tokenizers' split regex — ASCII-only in Java regex
  private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** Whitespace token count in ONE allocation-free byte scan ('\s' is
    * ASCII-only in Java regex, and the six whitespace bytes never occur
    * as UTF-8 continuation bytes, so the byte walk equals the char walk).
    * The Column form (`size(filter(split(text, "\\s+"), _ =!= ""))`) puts
    * an interpreted HOF lambda on every caller's hot path — qualityScore,
    * the curation gates, the stream gate — plus the split's array
    * materialization; differential-gated equal in TextFnsSpec.
    */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val ws = isWsByte(s.getByte(i))
      if (!ws && !inTok) count += 1
      inTok = !ws
      i += 1
    }
    count
  }

  /** Build the word → profile-indexes matcher [profileHits] scans with —
    * one HashMap the Expression bakes in at plan time (words shared by
    * several profiles, like es/fr "de", carry every index).
    */
  def buildProfileMatcher(profiles: Seq[Seq[String]]): java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    profiles.zipWithIndex.foreach { case (words, i) =>
      // distinct per profile: the Column forms (isin / array_contains) are
      // duplicate-insensitive, so a word listed twice must not count twice
      words.distinct.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  /** One-pass token-profile counter: lowercase once (the same
    * `UTF8String.toLowerCase` Spark's `lower()` runs), walk the tokens,
    * count per-profile stopword hits. Returns [n_tokens, hits(profile 0),
    * …, hits(profile k−1)]. Replaces k+1 interpreted HOF passes — langId
    * evaluated `filter(tokens(lower(text)), isin(words))` per profile and
    * stopwordRatio one more — with a single kernel; whole-stage codegen's
    * subexpression elimination then shares THIS call across every
    * consumer in the projection. Differential-gated against the Column
    * forms in TextFnsSpec (including the non-ASCII "für" profile word and
    * decomposed-accent tokens, where both forms compare exact code units).
    */
  def profileHits(s: UTF8String, matcher: java.util.HashMap[String, Array[Int]],
                  k: Int): ArrayData = {
    val str = s.toLowerCase.toString
    val counts = new Array[Int](k + 1)
    val len = str.length
    var i = 0
    while (i < len) {
      while (i < len && isWsChar(str.charAt(i))) i += 1
      val start = i
      while (i < len && !isWsChar(str.charAt(i))) i += 1
      if (i > start) {
        counts(0) += 1
        val hits = matcher.get(str.substring(start, i))
        if (hits != null) {
          var j = 0
          while (j < hits.length) { counts(hits(j) + 1) += 1; j += 1 }
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  // Pre-compiled PII patterns — the strings live in TextFns.Pii (single
  // source of truth for both the native and the Column scrub). Lazy so
  // class-init order between ExprImpl/TextFns/Expressions can't cycle.
  private lazy val piiEmail = java.util.regex.Pattern.compile(TextFns.Pii.email)
  private lazy val piiIpv4 = java.util.regex.Pattern.compile(TextFns.Pii.ipv4)
  private lazy val piiPhone = java.util.regex.Pattern.compile(TextFns.Pii.phone)

  /** One-pass PII scrub: byte-scan prefilter + three pre-compiled regex
    * passes over ONE String materialization. Bit-identical to the Column
    * form (`TextFns.scrubPiiColumns`, the retained differential baseline):
    * same patterns, same order (emails before IPs before phones), same
    * literal replacements, and the same prefilter predicate — '@' and the
    * ASCII digits never occur as UTF-8 continuation bytes, so the byte
    * scan equals the Column form's `rlike("[@0-9]")` char test. What the
    * native form saves on the PII-bearing path is the per-pass
    * UTF8String↔String round-trips (Spark's chained RegExpReplace
    * re-materializes a String per regex) and the branch plumbing; on
    * clean text it is a single allocation-free byte scan.
    */
  def scrubPii(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var hit = false
    while (i < n && !hit) {
      val b = s.getByte(i)
      if (b == '@' || (b >= '0' && b <= '9')) hit = true
      i += 1
    }
    if (!hit) return s
    UTF8String.fromString(
      piiPhone.matcher(
        piiIpv4.matcher(
          piiEmail.matcher(s.toString).replaceAll("<EMAIL>"))
          .replaceAll("<IP>"))
        .replaceAll("<PHONE>"))
  }

  /** Accent stripping: canonical decomposition (NFD) then removal of all
    * combining marks — café → cafe, ế → e. Matches DuckDB/utf8proc
    * `strip_accents` on Latin text (differentially tested in the qt13
    * oracle). Not a transliterator: ø, ß, æ are single code points, not
    * base+mark, and pass through unchanged (as they do in utf8proc).
    */
  def stripAccents(s: UTF8String): UTF8String =
    UTF8String.fromString(
      combiningMarks.matcher(
        java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD))
        .replaceAll(""))

  /** Multi-probe sign-LSH (Lv et al., VLDB'07): the base bucket (identical
    * to `lshBucket`, always element 0) plus up to `probes - 1` neighbor
    * buckets, each flipping the single sign bit whose hyperplane the vector
    * lies closest to (ascending |dot|, plane index as tiebreak) — the
    * buckets a true near neighbor most plausibly fell into. Capped at
    * planes + 1 buckets (base + one flip per plane). Same per-plane dot pass
    * as `lshBucket`; the dots are simply kept for the margin ordering.
    */
  def lshProbes(vec: ArrayData, planes: Int, family: Int, probes: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // null-poisoned vectors collapse to base bucket 0 (as lshBucket) with
    // no meaningful margins to probe
    val dots = planeDots(vec, planes, family)
    if (dots == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(0L))
    val bucket = signBucket(dots)
    val take = math.max(1, math.min(probes, planes + 1))
    val out = new Array[Long](take)
    out(0) = bucket
    if (take > 1) {
      val order = Array.tabulate(planes)(identity)
        .sortBy(i => (math.abs(dots(i)), i))
      var j = 1
      while (j < take) {
        out(j) = bucket ^ (1L << order(j - 1))
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

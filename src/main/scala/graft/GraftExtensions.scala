package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.Expressions

/** Session extension registering graft's native expressions as SQL
  * functions, so the ad-hoc SQL surface (SURVEY §3.3) can call them:
  *
  *   SELECT graft_simhash64(text) FROM documents
  *
  * Wired by GraftSession via `withExtensions`, or externally with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** Plan-time integer parameter: the native expressions bake these into
    * generated code, so they must be literals, never per-row expressions.
    */
  private def intLit(fn: String, what: String)(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_fnv1a64"),
      info("graft_fnv1a64", "graft_fnv1a64(str) - FNV-1a 64-bit hash."),
      (args: Seq[Expression]) => Expressions.Fnv1a64(args.head)))
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(str) - SimHash-64 of the token multiset."),
      (args: Seq[Expression]) => Expressions.SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("graft_wkt_centroid"),
      info("graft_wkt_centroid", "graft_wkt_centroid(wkt) - area-weighted centroid struct(x, y)."),
      (args: Seq[Expression]) => Expressions.WktCentroid(args.head)))
    e.injectFunction((FunctionIdentifier("graft_shingle_set"),
      info("graft_shingle_set",
        "graft_shingle_set(text, n) - distinct word n-gram shingles; n must be an integer literal."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_shingle_set takes 2 arguments (text, n), got ${args.length}")
        Expressions.ShingleSet(args.head, intLit("graft_shingle_set", "n")(args(1)))
      }))
    e.injectFunction((FunctionIdentifier("graft_lsh_bucket"),
      info("graft_lsh_bucket",
        "graft_lsh_bucket(vec, planes, family) - sign-random-projection LSH bucket id; " +
          "planes/family must be integer literals (they select the hyperplane set at plan time)."),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_lsh_bucket takes 3 arguments (vec, planes, family), got ${args.length}")
        Expressions.LshBucket(args.head,
          intLit("graft_lsh_bucket", "planes")(args(1)),
          intLit("graft_lsh_bucket", "family")(args(2)))
      }))
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot",
        "graft_dot(a, b) - dot product of two float vectors in double precision; " +
          "null on ragged lengths or null elements."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot takes 2 arguments, got ${args.length}")
        Expressions.DotF32(args.head, args(1))
      }))
    e.injectFunction((FunctionIdentifier("graft_dot_i32"),
      info("graft_dot_i32",
        "graft_dot_i32(a, b) - integer dot product of two int vectors as a long " +
          "(the int8-quantized scoring kernel); null on ragged lengths or null elements."),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot_i32 takes 2 arguments, got ${args.length}")
        Expressions.DotI32(args.head, args(1))
      }))
    e.injectFunction((FunctionIdentifier("graft_fold_sum"),
      info("graft_fold_sum",
        "graft_fold_sum(arr, idx) - left-to-right sum of struct field idx (DOUBLE) over an " +
          "array in array order (pass array_sort(collect_list(struct(k, v)))); idx must be " +
          "an integer literal. The deterministic ordered-fold kernel of every oracle-mode sum."),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"graft_fold_sum takes 1-2 arguments (arr[, idx]), got ${args.length}")
        val idx = if (args.length == 1) 1 else intLit("graft_fold_sum", "idx")(args(1))
        Expressions.FoldSumField(args.head, idx)
      }))
    e.injectFunction((FunctionIdentifier("graft_hash_embedding"),
      info("graft_hash_embedding",
        "graft_hash_embedding(text, dim) - deterministic hash-derived float[dim] embedding " +
          "(the encoder stand-in); dim must be an integer literal."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_hash_embedding takes 2 arguments (text, dim), got ${args.length}")
        Expressions.HashEmbedding(args.head, intLit("graft_hash_embedding", "dim")(args(1)))
      }))
    e.injectFunction((FunctionIdentifier("graft_lsh_probes"),
      info("graft_lsh_probes",
        "graft_lsh_probes(vec, planes, family, probes) - multi-probe sign-LSH bucket array " +
          "(base bucket first, then lowest-margin bit flips); ints must be literals."),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          s"graft_lsh_probes takes 4 arguments (vec, planes, family, probes), got ${args.length}")
        Expressions.LshProbes(args.head,
          intLit("graft_lsh_probes", "planes")(args(1)),
          intLit("graft_lsh_probes", "family")(args(2)),
          intLit("graft_lsh_probes", "probes")(args(3)))
      }))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(shingles, k) - k-hash MinHash signature (array<bigint>) of a " +
          "shingle array (pair with graft_shingle_set); k must be an integer literal."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_minhash_sig takes 2 arguments (shingles, k), got ${args.length}")
        Expressions.MinHashSig(args.head, intLit("graft_minhash_sig", "k")(args(1)))
      }))
    e.injectFunction((FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams",
        "graft_ngrams(text, n) - ALL word n-gram occurrences in order (non-distinct); " +
          "n must be an integer literal."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_ngrams takes 2 arguments (text, n), got ${args.length}")
        Expressions.Ngrams(args.head, intLit("graft_ngrams", "n")(args(1)))
      }))
    e.injectFunction((FunctionIdentifier("graft_normalize"),
      info("graft_normalize",
        "graft_normalize(str, form) - Unicode normalization; form is a string literal " +
          "NFC/NFD/NFKC/NFKD (default NFC with one argument)."),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"graft_normalize takes 1-2 arguments (str[, form]), got ${args.length}")
        val form = if (args.length == 1) "NFC" else args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_normalize: form must be a string literal, got $other")
        }
        Expressions.NormalizeText(args.head, form)
      }))
    e.injectFunction((FunctionIdentifier("graft_window_hashes"),
      info("graft_window_hashes",
        "graft_window_hashes(text, w) - fnv1a64 of every w-token window (the duplicate-span " +
          "map pass, Dedup.duplicateSpans); w must be an integer literal. The full span " +
          "detector is this + two GROUP BYs + one hash equi-join in plain SQL."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_window_hashes takes 2 arguments (text, w), got ${args.length}")
        Expressions.WindowHashes(args.head, intLit("graft_window_hashes", "w")(args(1)))
      }))
    e.injectFunction((FunctionIdentifier("graft_strip_accents"),
      info("graft_strip_accents",
        "graft_strip_accents(str) - NFD decomposition + combining-mark removal."),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_strip_accents takes 1 argument, got ${args.length}")
        Expressions.StripAccents(args.head)
      }))

    // Composed Column functions (TextFns) exposed to SQL: the factory
    // wraps the incoming child Expression as a Column, builds the same
    // tree the Scala API builds, and unwraps — SQL and Column callers
    // share ONE definition, so they cannot drift (SqlSurfaceSpec pins
    // equality). These are plain compositions of codegen'd built-ins; no
    // UDF crosses this seam.
    def composed1(name: String, usage: String)(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name, usage),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name takes 1 argument, got ${args.length}")
          // converted (not expression): the builder's return tree feeds the
          // analyzer directly, so it must be catalyst nodes, not a lazy
          // ColumnNodeExpression wrapper (which would reach codegen unresolved)
          org.apache.spark.sql.graftbridge.Bridge.converted(
            f(org.apache.spark.sql.graftbridge.Bridge.column(args.head)))
        }))
    composed1("graft_token_count",
      "graft_token_count(text) - whitespace token count; null text -> null.")(
      graft.functions.TextFns.tokenCount)
    composed1("graft_subword_count",
      "graft_subword_count(text) - BPE-ish sub-word count (letter runs, digit runs, punct).")(
      graft.functions.TextFns.subwordCount)
    composed1("graft_quality_score",
      "graft_quality_score(text) - [0,1] doc-quality heuristic (length, word length, " +
        "punctuation, stopword ratios; default stopword profiles).")(
      graft.functions.TextFns.qualityScore(_))
    composed1("graft_lang_id",
      "graft_lang_id(text) - stopword-profile language id (en/es/fr/de or und).")(
      graft.functions.TextFns.LangId.langId)
    composed1("graft_scrub_pii",
      "graft_scrub_pii(text) - redact emails/IPv4/phone runs to <EMAIL>/<IP>/<PHONE>.")(
      graft.functions.TextFns.scrubPii)
    composed1("graft_fingerprint",
      "graft_fingerprint(text) - md5 of whitespace-normalized lowercase text.")(
      graft.functions.TextFns.fingerprint)
    composed1("graft_fingerprint64",
      "graft_fingerprint64(text) - xxhash64 of whitespace-normalized lowercase text.")(
      graft.functions.TextFns.fingerprint64)
    composed1("graft_char_count",
      "graft_char_count(text) - non-whitespace character count (script-ratio denominator).")(
      graft.functions.TextFns.charCount)
    e.injectFunction((FunctionIdentifier("graft_script_count"),
      info("graft_script_count",
        "graft_script_count(text, script) - characters in the given Unicode script " +
          "('Latin', 'Cyrillic', 'Han', ...); script must be a string literal (it is " +
          "baked into the compiled regex at plan time)."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_script_count takes 2 arguments (text, script), got ${args.length}")
        val script = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"graft_script_count: script must be a string literal, got $other")
        }
        require(script.matches("[A-Za-z_]+"),
          s"graft_script_count: not a Unicode script name: '$script'")
        org.apache.spark.sql.graftbridge.Bridge.converted(
          graft.functions.TextFns.scriptCount(
            org.apache.spark.sql.graftbridge.Bridge.column(args.head), script))
      }))
    e.injectFunction((FunctionIdentifier("graft_deflate_len"),
      info("graft_deflate_len",
        "graft_deflate_len(str, level) - DEFLATE-compressed byte length of the UTF-8 text " +
          "(raw stream); level must be an integer literal in [1,9]. " +
          "graft_deflate_len(t, 6) / octet_length(t) is the compressibility quality signal."),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_deflate_len takes 2 arguments (text, level), got ${args.length}")
        Expressions.DeflateLen(args.head, intLit("graft_deflate_len", "level")(args(1)))
      }))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Dedup

/** Native Catalyst expressions for graft's custom scalar functions — the
  * upgrade path from UDFs (SURVEY §7.3): no Scala-object serialization per
  * row, null handling via `UnaryExpression.nullSafeEval`, and codegen that
  * stays inside whole-stage compilation (emitting a static-helper call,
  * exactly how Spark's own hash expressions generate).
  */
object Expressions {

  /** fnv1a64(string) → long, with full whole-stage codegen. Generated Java
    * calls ExprImpl's STATIC forwarders — ExprImpl must stay a top-level
    * object (nested Scala objects get no static forwarders, and Janino
    * would reject `Expressions$Impl$` references, silently degrading the
    * whole stage to interpreted execution).
    */
  case class Fnv1a64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      ExprImpl.fnv1a64(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.fnv1a64($c)")
    override protected def withNewChildInternal(c: Expression): Fnv1a64 = copy(c)
    override def prettyName: String = "graft_fnv1a64"
  }

  /** deflate_len(string, level) → long: DEFLATE-compressed byte length of
    * the UTF-8 text (raw stream, no zlib header). One pass per row inside
    * whole-stage codegen; the compressibility quality signal's kernel.
    */
  case class DeflateLen(child: Expression, level: Int) extends UnaryExpression {
    require(level >= 1 && level <= 9, s"deflate level out of [1,9]: $level")
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      ExprImpl.deflateLen(v.asInstanceOf[UTF8String], level)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.deflateLen($c, $level)")
    override protected def withNewChildInternal(c: Expression): DeflateLen = copy(child = c)
    override def prettyName: String = "graft_deflate_len"
  }

  /** lsh_bucket(array<float>, planes, family) → long, with full whole-stage
    * codegen: the single-pass primitive-loop form of the sign-LSH bucket id
    * (see ExprImpl.lshBucket). `planes`/`family` are plan-time parameters,
    * not child expressions — they select the hyperplane set, never vary per
    * row, and baking them into the generated call keeps the hot loop free
    * of per-row argument evaluation.
    */
  case class LshBucket(child: Expression, planes: Int, family: Int) extends UnaryExpression {
    // 1L << p aliases mod 64: plane 64 would silently overwrite plane 0's
    // bit — fail at plan time, not with wrong buckets
    require(planes >= 1 && planes <= 63,
      s"planes must be in [1, 63] (bucket bits live in one long): $planes")
    override def dataType: DataType = LongType
    // strict array<float> input: SQL exposure means a silent getFloat
    // reinterpretation of wider element types must be an analysis error
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_lsh_bucket expects array<float> (an embedding column), got ${other.sql}")
      }
    override def nullSafeEval(v: Any): Any =
      ExprImpl.lshBucket(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes, family)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.lshBucket($c, $planes, $family)")
    override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
    override def prettyName: String = "graft_lsh_bucket"
  }

  /** lsh_probes(array<float>, planes, family, probes) → array<long>: the
    * base sign-LSH bucket plus up to `probes - 1` multi-probe neighbor
    * buckets (Lv et al., VLDB'07 — flip the lowest-|margin| sign bits, one
    * at a time). Query-side only: probing the neighbors most likely to hold
    * a true near neighbor buys recall at `probes×` candidate cost WITHOUT
    * re-bucketing (or growing) the corpus side, which stays one bucket per
    * table. Element 0 is always the base bucket, so `lshProbes(v, p, f,
    * 1)[0] == lshBucket(v, p, f)` (differential-tested in ExpressionsSpec).
    */
  case class LshProbes(child: Expression, planes: Int, family: Int, probes: Int)
      extends UnaryExpression {
    require(planes >= 1 && planes <= 63,
      s"planes must be in [1, 63] (bucket bits live in one long): $planes")
    require(probes >= 1, s"probes must be >= 1: $probes")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_lsh_probes expects array<float> (an embedding column), got ${other.sql}")
      }
    override def nullSafeEval(v: Any): Any =
      ExprImpl.lshProbes(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        planes, family, probes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.lshProbes($c, $planes, $family, $probes)")
    override protected def withNewChildInternal(c: Expression): LshProbes = copy(child = c)
    override def prettyName: String = "graft_lsh_probes"
  }

  /** hash_embedding(string, dim) → array<float>: the deterministic
    * encoder stand-in in one codegen'd pass (see ExprImpl.hashEmbedding)
    * — replaces the Column HOF formulation that interpreted the full hash
    * chain per element (kept as Similarity.hashEmbeddingColumns, the
    * bit-identical differential baseline). `dim` is a plan-time parameter
    * like LshBucket's planes.
    */
  case class HashEmbedding(child: Expression, dim: Int) extends UnaryExpression {
    require(dim >= 1, s"dim must be >= 1: $dim")
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_hash_embedding expects string, got ${other.sql}")
      }
    override def nullSafeEval(v: Any): Any =
      ExprImpl.hashEmbedding(v.asInstanceOf[UTF8String], dim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.hashEmbedding($c, $dim)")
    override protected def withNewChildInternal(c: Expression): HashEmbedding = copy(child = c)
    override def prettyName: String = "graft_hash_embedding"
  }

  /** shingle_set(string, n) → array<string>: the near-dup hot path's
    * tokenize+n-gram+distinct in one codegen'd pass (see ExprImpl.shingleSet)
    * — replaces a Scala UDF whose Seq[String] bridging dominated the
    * shingling stage. `n` is a plan-time parameter like LshBucket's planes.
    */
  case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
    // the UDF baseline rejected n < 1 via sliding(); keep the native path
    // equally strict — n = 0 would give every doc the shingle set [""]
    require(n >= 1, s"n must be >= 1: $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_shingle_set expects string, got ${other.sql}")
      }
    override def nullSafeEval(v: Any): Any =
      ExprImpl.shingleSet(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.shingleSet($c, $n)")
    override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
    override def prettyName: String = "graft_shingle_set"
  }

  /** minhash_sig(array<string>, numHashes) → array<long>, codegen'd (see
    * ExprImpl.minhashSig; replaces the Seq-bridging UDF in qt06's hot path,
    * which stays as the differential baseline).
    */
  case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_minhash_sig expects array<string>, got ${other.sql}")
      }
    override def nullSafeEval(v: Any): Any =
      ExprImpl.minhashSig(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.minhashSig($c, $numHashes)")
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "graft_minhash_sig"
  }

  /** dot_f32(array<float>, array<float>) → double: primitive-loop dot
    * product, the hot inner op of every exact/verify cosine stage (see
    * ExprImpl.dotF32 for the allocation story and null semantics). Nullable
    * even for non-null inputs: ragged lengths / null elements → null,
    * mirroring the zip_with Column form it replaces (which stays as the
    * differential baseline, `Similarity.dotProductColumns`).
    */
  case class DotF32(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_dot expects (array<float>, array<float>), got (${l.sql}, ${r.sql})")
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      ExprImpl.dotF32(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Double ${ev.value}_r = graft.functions.ExprImpl.dotF32($a, $b);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF32 =
      copy(left = l, right = r)
    override def prettyName: String = "graft_dot"
  }

  /** fold_sum_field(array<struct<...>>) → double: left-to-right sum of the
    * struct's field `idx` in ARRAY ORDER (see ExprImpl.foldSumField) — the
    * codegen'd kernel of every oracle-mode ordered fold. Callers pass an
    * already-sorted array (`array_sort(collect_list(struct(k, v)))`); the
    * summed field must be DOUBLE at plan time.
    */
  case class FoldSumField(child: Expression, idx: Int) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    private def numFields: Int = child.dataType match {
      case ArrayType(s: StructType, _) => s.length
      case _ => -1
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(s: StructType, _)
            if idx >= 0 && idx < s.length && s(idx).dataType == DoubleType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_fold_sum expects array<struct> with a DOUBLE at field $idx, got ${other.sql}")
      }
    override def nullSafeEval(v: Any): Any =
      ExprImpl.foldSumField(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        idx, numFields)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Double ${ev.value}_r = graft.functions.ExprImpl.foldSumField($c, $idx, $numFields);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")
    override protected def withNewChildInternal(c: Expression): FoldSumField = copy(child = c)
    override def prettyName: String = "graft_fold_sum"
  }

  /** dot_i32(array<int>, array<int>) → long: primitive-loop integer dot
    * product, the int8-quantized scoring kernel (see ExprImpl.dotI32).
    */
  case class DotI32(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_dot_i32 expects (array<int>, array<int>), got (${l.sql}, ${r.sql})")
      }
    override def nullSafeEval(a: Any, b: Any): Any =
      ExprImpl.dotI32(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Long ${ev.value}_r = graft.functions.ExprImpl.dotI32($a, $b);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.longValue(); }""")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotI32 =
      copy(left = l, right = r)
    override def prettyName: String = "graft_dot_i32"
  }

  /** ngrams(string, n) → array<string>: ALL word n-gram occurrences in
    * order (the frequency-count twin of `shingle_set`; see ExprImpl.ngrams
    * for the CollapseProject hazard that makes the Column form quadratic).
    */
  case class Ngrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"n must be >= 1: $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      ExprImpl.ngrams(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.ngrams($c, $n)")
    override protected def withNewChildInternal(c: Expression): Ngrams = copy(child = c)
    override def prettyName: String = "graft_ngrams"
  }

  /** window_hashes(string, w) → array<long>: fnv1a64 of each w-token
    * window string (1 hash per token position; < w tokens → empty). The
    * duplicate-span detector's map pass — one primitive sweep per row, no
    * window-string materialization (see ExprImpl.windowHashes).
    */
  case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
    require(w >= 1, s"w must be >= 1: $w")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      ExprImpl.windowHashes(v.asInstanceOf[UTF8String], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.windowHashes($c, $w)")
    override protected def withNewChildInternal(c: Expression): WindowHashes = copy(child = c)
    override def prettyName: String = "graft_window_hashes"
  }

  /** normalize_text(string, form) → string: Unicode normalization with the
    * form (NFC/NFD/NFKC/NFKD) fixed at plan time. Spark itself ships no
    * normalization function, yet corpus dedup NEEDS one — the same visible
    * text arrives composed from one crawl and decomposed from another, and
    * every hash-based operator (fingerprints, MinHash, exact dedup) treats
    * them as distinct documents unless the pipeline canonicalizes first.
    */
  case class NormalizeText(child: Expression, form: String) extends UnaryExpression {
    private val formIdx = Seq("NFC", "NFD", "NFKC", "NFKD").indexOf(form.toUpperCase)
    require(formIdx >= 0, s"unknown normalization form '$form' (want NFC/NFD/NFKC/NFKD)")
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      ExprImpl.normalizeText(v.asInstanceOf[UTF8String], formIdx)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.normalizeText($c, $formIdx)")
    override protected def withNewChildInternal(c: Expression): NormalizeText = copy(child = c)
    override def prettyName: String = "graft_normalize"
  }

  /** barrier(expr) → expr, value-identical: an optimizer FENCE. Its only
    * behavior is `deterministic = false`, which makes every
    * alias-substitution rule (CollapseProject, predicate pushdown through
    * a Project) refuse to move the aliased subtree — so an expensive
    * projected expression is computed ONCE per row and every consumer
    * reads the attribute. Without it, a filter above a projected
    * `scrubPii(normalizeText(text))` is pushed below the projection with
    * the FULL subtree substituted into each of the predicate's references
    * (measured: the streaming gate's prefix at 14.7 s/M vs 2.9 s/M
    * fenced — the nesting-defeats-CSE trap in optimizer-rule form).
    * Runtime is a pure passthrough in both eval and codegen; it does NOT
    * extend Nondeterministic (no state, no initialization) — only the
    * placement flag flips.
    *
    * PLACEMENT CONSTRAINTS (`deterministic = false` has side effects
    * beyond blocking pushdown — keep call sites inside these lines):
    *   - The analyzer REJECTS non-deterministic expressions outside
    *     Project / Filter / Aggregate / Window: a barrier used as a join
    *     key, inside a groupBy expression, or in a sort key fails
    *     analysis. Fence in a Project FIRST, then join/group/sort on the
    *     projected attribute.
    *   - ColumnPruning cannot drop an unused non-deterministic alias: a
    *     DEAD barriered column keeps its full compute cost in the plan.
    *     Only fence columns every downstream consumer actually reads;
    *     never fence speculative/optional projections that a later
    *     select may prune.
    */
  case class Barrier(child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override lazy val deterministic: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      child.eval(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      child.genCode(ctx) // pure passthrough — zero generated code of its own
    override protected def withNewChildInternal(c: Expression): Barrier = copy(c)
    override def prettyName: String = "graft_barrier"
  }

  /** strip_accents(string) → string: NFD + combining-mark removal (see
    * ExprImpl.stripAccents for the exact contract vs utf8proc).
    */
  case class StripAccents(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      ExprImpl.stripAccents(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.stripAccents($c)")
    override protected def withNewChildInternal(c: Expression): StripAccents = copy(c)
    override def prettyName: String = "graft_strip_accents"
  }

  /** token_count(string) → int: whitespace token count as one
    * allocation-free byte scan (see ExprImpl.tokenCount).
    */
  case class TokenCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      ExprImpl.tokenCount(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.tokenCount($c)")
    override protected def withNewChildInternal(c: Expression): TokenCount = copy(c)
    override def prettyName: String = "graft_token_count"
  }

  /** profile_hits(string) → array<int>: [n_tokens, hits per word list] in
    * one lowercase+tokenize pass (see ExprImpl.profileHits). The word
    * lists are baked in at plan time; the matcher rides into generated
    * code as a reference object.
    */
  case class ProfileHits(child: Expression, profiles: Seq[Seq[String]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val matcher = ExprImpl.buildProfileMatcher(profiles)
    override def nullSafeEval(v: Any): Any =
      ExprImpl.profileHits(v.asInstanceOf[UTF8String], matcher, profiles.length)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = ctx.addReferenceObj("profileMatcher", matcher,
        "java.util.HashMap<String, int[]>")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.ExprImpl.profileHits($c, $m, ${profiles.length})")
    }
    override protected def withNewChildInternal(c: Expression): ProfileHits =
      copy(child = c)
    override def prettyName: String = "graft_profile_hits"
  }

  /** scrub_pii(string) → string: one-pass email/IPv4/phone redaction (see
    * ExprImpl.scrubPii for the exact contract vs the Column form).
    */
  case class ScrubPii(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      ExprImpl.scrubPii(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.scrubPii($c)")
    override protected def withNewChildInternal(c: Expression): ScrubPii = copy(c)
    override def prettyName: String = "graft_scrub_pii"
  }

  /** simhash64(string) → long, with full whole-stage codegen. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      ExprImpl.simhash64(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.simhash64($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
    override def prettyName: String = "graft_simhash64"
  }

  /** wkt_centroid(string) → struct<x double, y double>. CodegenFallback on
    * purpose: WKT parsing is dimension-side (thousands of zone polygons,
    * not the 100 TB fact side), so interpreted eval costs nothing while
    * keeping the expression usable inside any plan, SQL included.
    */
  case class WktCentroid(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType)))
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      Spatial.wktCentroidXY(v.asInstanceOf[UTF8String].toString) match {
        case Some((x, y)) => InternalRow(x, y)
        case None => null
      }
    override protected def withNewChildInternal(c: Expression): WktCentroid = copy(c)
    override def prettyName: String = "graft_wkt_centroid"
  }

  // Column ↔ Expression bridges (Spark 4 classic API, via graftbridge)
  private def wrap(e: Expression): Column = org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def unwrap(c: Column): Expression = org.apache.spark.sql.graftbridge.Bridge.expression(c)

  def fnv1a64(c: Column): Column = wrap(Fnv1a64(unwrap(c)))
  def hashEmbedding(c: Column, dim: Int): Column = wrap(HashEmbedding(unwrap(c), dim))
  def deflateLen(c: Column, level: Int = 6): Column = wrap(DeflateLen(unwrap(c), level))
  def simhash64(c: Column): Column = wrap(SimHash64(unwrap(c)))
  def wktCentroid(c: Column): Column = wrap(WktCentroid(unwrap(c)))
  def lshBucket(c: Column, planes: Int, family: Int): Column =
    wrap(LshBucket(unwrap(c), planes, family))
  def lshProbes(c: Column, planes: Int, family: Int, probes: Int): Column =
    wrap(LshProbes(unwrap(c), planes, family, probes))
  def dotF32(a: Column, b: Column): Column = wrap(DotF32(unwrap(a), unwrap(b)))
  def dotI32(a: Column, b: Column): Column = wrap(DotI32(unwrap(a), unwrap(b)))

  /** Ordered fold: Σ over `sortedArr`'s struct field `idx` (double),
    * left-to-right in array order. Pass `array_sort(collect_list(
    * struct(key, value)))`.
    */
  def foldSumField(sortedArr: Column, idx: Int = 1): Column =
    wrap(FoldSumField(unwrap(sortedArr), idx))
  def shingleSet(c: Column, n: Int): Column = wrap(ShingleSet(unwrap(c), n))
  def ngrams(c: Column, n: Int): Column = wrap(Ngrams(unwrap(c), n))
  def windowHashes(c: Column, w: Int): Column = wrap(WindowHashes(unwrap(c), w))
  def normalizeText(c: Column, form: String = "NFC"): Column =
    wrap(NormalizeText(unwrap(c), form))
  def barrier(c: Column): Column = wrap(Barrier(unwrap(c)))
  def stripAccents(c: Column): Column = wrap(StripAccents(unwrap(c)))
  def scrubPii(c: Column): Column = wrap(ScrubPii(unwrap(c)))
  def tokenCount(c: Column): Column = wrap(TokenCount(unwrap(c)))
  def profileHits(c: Column, profiles: Seq[Seq[String]]): Column =
    wrap(ProfileHits(unwrap(c), profiles))
  def minhashSig(c: Column, numHashes: Int): Column = wrap(MinHashSig(unwrap(c), numHashes))
}

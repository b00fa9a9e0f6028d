package graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{concat, lit}
import graft.functions.Expressions._

/** The round-11 barrier audit as an automated lint: an expensive
  * projected kernel with a filter above it and no fence gets the kernel
  * subtree SUBSTITUTED into every predicate reference by alias
  * substitution / predicate pushdown (the nesting-defeats-CSE trap —
  * measured 14.7 vs 1.9 s/M on the streaming gate shape, then found in
  * four batch families by hand). The hand sweep gated the known spots
  * (PlanSpec); this spec walks EVERY catalog entry's optimized plan so a
  * new operator can't reintroduce the trap silently.
  *
  * Rule: a registered expensive kernel (normalize / scrub / tokenize /
  * shingle / minhash / window-hash / deflate / dot / simhash / langid /
  * embedding) must not appear with the SAME canonicalized subtree
  *   (a) in a node AND one of its ancestors (one root-to-leaf path) —
  *       the pushdown re-nesting fingerprint: every consumer level pays
  *       the kernel again; or
  *   (b) more than once inside one NON-Project/Aggregate node (a Filter's
  *       conjuncts evaluate independently — no CSE across them, the
  *       measured 14.7 s/M shape; a Join condition likewise).
  * Duplicates WITHIN one Project/Aggregate are legal: whole-stage codegen
  * subexpression elimination evaluates them once (langId's argmax chain
  * and qualityScore's component reuse are deliberately built on that).
  * Occurrences in SIBLING subtrees (union branches, join sides) are
  * legal — each row passes one branch, the kernel runs once per row.
  *
  * Scope note: entries that materialize internally (the composed
  * curation family returns a literal counts frame) expose only their
  * final plan here; their internals are fenced at the source and gated
  * by PlanSpec's chunker test + the stage persists. Everything whose
  * kernels ARE in the returned plan — the ~120 direct entries — is
  * covered line by line.
  */
class CatalogLintSpec extends SparkSpec {
  import spark.implicits._

  private def isKernel(e: Expression): Boolean = e match {
    case _: NormalizeText | _: ScrubPii | _: TokenCount | _: ShingleSet |
         _: MinHashSig | _: WindowHashes | _: DeflateLen | _: HashEmbedding |
         _: DotF32 | _: DotI32 | _: SimHash64 | _: Ngrams | _: ProfileHits |
         _: StripAccents => true
    case _ => false
  }

  /** Canonicalized duplicate-kernel occurrences on any root-to-leaf path
    * of the plan (rule above). Returns the offending canonical subtrees.
    */
  private def lint(plan: LogicalPlan): Seq[String] = {
    val flagged = scala.collection.mutable.LinkedHashSet.empty[String]
    val onPath = scala.collection.mutable.Map.empty[String, Int]
    def visit(node: LogicalPlan): Unit = {
      val here = node.expressions.flatMap(_.collect {
        case e if isKernel(e) => e.canonicalized.toString
      })
      val counts = here.groupBy(identity).map { case (k, v) => k -> v.size }
      val cseCovered = node.isInstanceOf[org.apache.spark.sql.catalyst
          .plans.logical.Project] ||
        node.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]
      counts.foreach { case (c, n) =>
        if ((n > 1 && !cseCovered) || onPath.contains(c)) flagged += c
      }
      counts.foreach { case (c, n) => onPath(c) = onPath.getOrElse(c, 0) + n }
      (node.children ++ node.subqueries).foreach(visit)
      counts.foreach { case (c, n) =>
        val m = onPath(c) - n
        if (m <= 0) onPath.remove(c) else onPath(c) = m
      }
    }
    visit(plan)
    flagged.toSeq
  }

  test("lint flags the deliberately unfenced twin (the trap is detectable)") {
    // the exact shape the barrier exists for: expensive projection, filter
    // above it referencing the alias twice, NO fence — alias substitution
    // inlines the scrub∘normalize subtree into both predicate references.
    // Range source: ConvertToLocalRelation would fold a local Seq whole.
    val df = spark.range(100)
      .select($"id", concat(lit("doc text number "), $"id").as("text"))
      .select($"id",
        graft.functions.TextFns.scrubPii(
          normalizeText($"text", "NFC")).as("canon"))
      .filter(org.apache.spark.sql.functions.length($"canon") > 3 &&
        $"canon".contains("doc"))
    val hits = lint(df.queryExecution.optimizedPlan)
    assert(hits.nonEmpty,
      s"lint missed the unfenced twin:\n${df.queryExecution.optimizedPlan}")
    // and the FENCED form of the same query is clean
    val fenced = spark.range(100)
      .select($"id", concat(lit("doc text number "), $"id").as("text"))
      .select($"id",
        barrier(graft.functions.TextFns.scrubPii(
          normalizeText($"text", "NFC"))).as("canon"))
      .filter(org.apache.spark.sql.functions.length($"canon") > 3 &&
        $"canon".contains("doc"))
    assert(lint(fenced.queryExecution.optimizedPlan).isEmpty,
      "lint flagged the fenced twin")
  }

  test("union branches sharing a kernel are NOT flagged (once per row is legal)") {
    val base = spark.range(50)
      .select($"id", concat(lit("text "), $"id").as("text"))
      .select($"id", graft.functions.TextFns.tokenCount($"text").as("n"))
    assert(lint(base.union(base).queryExecution.optimizedPlan).isEmpty)
  }

  // one test per catalog entry: every optimized plan free of re-nested
  // kernels (plans build lazily; entries that execute during construction
  // run at sf0.001, same cost class as QueriesSmokeSpec)
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no re-nested expensive kernel in the optimized plan") {
      val hits = lint(fn(spark, sf).queryExecution.optimizedPlan)
      assert(hits.isEmpty,
        s"$name re-computes kernel(s) on one path:\n${hits.mkString("\n")}")
    }
  }
}

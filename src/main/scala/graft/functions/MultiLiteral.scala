package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-literal substring screening via an AHO-CORASICK automaton — the
  * native-Expression tier for "does this text contain ANY of these K
  * phrases" (takedown screens, benchmark-contamination literals, blocklist
  * audits).
  *
  * Why an Expression: the built-in formulation is
  * `contains(text, p1) OR contains(text, p2) OR ...` — K separate scans of
  * every string (O(K·n) per row, and a K-deep boolean tree that stops
  * codegen fusing well past a few hundred terms). Aho-Corasick matches ALL
  * K patterns in ONE left-to-right pass (O(n + matches) per row), with the
  * automaton built once per executor and shared via a broadcast-style
  * reference object in the generated code. At 100 TB × 10⁴ blocklist
  * phrases this is the difference between a linear scan and a 10⁴× blowup.
  */
object MultiLiteral {

  /** Serializable Aho-Corasick automaton over Java chars. Built on the
    * driver from the (deterministic) pattern list; reconstructed lazily on
    * executors after deserialization.
    *
    * MEMORY SHAPE (matters at the documented 10⁴–10⁵-pattern scale): the
    * trie is built with per-node hash maps, then COMPACTED into flat CSR
    * edge arrays (sorted chars + binary search) — ~25 B/node instead of
    * the ~200 B/node a live map-per-node costs, so a 10⁵-pattern screen is
    * tens of MB, not GB. Expressions obtain instances through the per-JVM
    * [[AcAutomaton.forPatterns]] cache: every task thread that deserializes
    * a copy of the expression shares ONE automaton (without this, 32
    * executor threads × a large automaton OOMed the probe — measured,
    * round 12). */
  final class AcAutomaton(val patterns: Seq[String]) extends Serializable {
    // CSR form: node u's edges live in [edgeStart(u), edgeStart(u+1)),
    // chars sorted for binary search; outputs(u) is the full output set of
    // u (own + inherited through fail links), EmptyInts-shared when empty.
    @transient private lazy val (edgeStart, edgeChar, edgeTo, fail, outputs) = build()

    private def build(): (Array[Int], Array[Char], Array[Int], Array[Int], Array[Array[Int]]) = {
      val ch = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
      val out = mutable.ArrayBuffer(List.empty[Int])
      patterns.zipWithIndex.foreach { case (p, id) =>
        var node = 0
        p.foreach { c =>
          node = ch(node).getOrElse(c.toLong, {
            ch += mutable.LongMap.empty[Int]
            out += Nil
            val nn = ch.size - 1
            ch(node)(c.toLong) = nn
            nn
          })
        }
        out(node) = id :: out(node)
      }
      val n = ch.size
      val failArr = Array.fill(n)(0)
      val queue = mutable.Queue.empty[Int]
      ch(0).foreach { case (_, v) => queue += v } // depth-1: fail = root
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        ch(u).foreach { case (c, v) =>
          queue += v
          // walk u's fail chain to the deepest state with a c-transition
          var f = failArr(u)
          while (f != 0 && !ch(f).contains(c)) f = failArr(f)
          val cand = ch(f).getOrElse(c, 0)
          failArr(v) = if (cand != v) cand else 0 // depth-1 self-loop guard
          // inherit outputs through the fail link (suffix matches)
          out(v) = out(v) ++ out(failArr(v))
        }
      }
      // compact: CSR edges with per-node sorted chars, shared-empty outputs
      val starts = new Array[Int](n + 1)
      var total = 0
      var u = 0
      while (u < n) { starts(u) = total; total += ch(u).size; u += 1 }
      starts(n) = total
      val chars = new Array[Char](total)
      val tos = new Array[Int](total)
      u = 0
      while (u < n) {
        val sorted = ch(u).toArray.sortBy(_._1)
        var j = 0
        while (j < sorted.length) {
          chars(starts(u) + j) = sorted(j)._1.toChar
          tos(starts(u) + j) = sorted(j)._2
          j += 1
        }
        u += 1
      }
      val outs = Array.tabulate(n)(v =>
        if (out(v).isEmpty) AcAutomaton.EmptyInts else out(v).toArray.sorted)
      (starts, chars, tos, failArr, outs)
    }

    /** Child of `node` on `c`, or -1 — binary search in the node's sorted
      * edge range. */
    private def step(node: Int, c: Char): Int = {
      var lo = edgeStart(node)
      var hi = edgeStart(node + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = edgeChar(mid)
        if (mc == c) return edgeTo(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** Distinct, ascending ids of every pattern occurring in `text`. */
    def matchedIds(text: String): Array[Int] = {
      val hits = mutable.SortedSet.empty[Int]
      var node = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = text.charAt(i)
        var next = step(node, c)
        while (node != 0 && next < 0) { node = fail(node); next = step(node, c) }
        node = if (next >= 0) next else 0
        val o = outputs(node)
        var j = 0
        while (j < o.length) { hits += o(j); j += 1 }
        i += 1
      }
      hits.toArray
    }

    /** Codegen entry (compiles to `int[] matchedIdsJava(String)`). */
    def matchedIdsJava(text: String): Array[Int] = matchedIds(text)

    /** COUNT of distinct patterns occurring in `text` — same automaton
      * walk as [[matchedIds]] with a BitSet instead of a materialized id
      * array, for callers that only need the count (contamination
      * screens). Early-outs when every pattern has already matched. */
    def matchedCount(text: String): Int = {
      val k = patterns.size
      val seen = new java.util.BitSet(k)
      var found = 0
      var node = 0
      var i = 0
      val n = text.length
      while (i < n && found < k) {
        val c = text.charAt(i)
        var next = step(node, c)
        while (node != 0 && next < 0) { node = fail(node); next = step(node, c) }
        node = if (next >= 0) next else 0
        val o = outputs(node)
        var j = 0
        while (j < o.length) {
          if (!seen.get(o(j))) { seen.set(o(j)); found += 1 }
          j += 1
        }
        i += 1
      }
      found
    }

    /** Codegen entry. */
    def matchedCountJava(text: String): Int = matchedCount(text)

    /** The codegen path serializes the automaton INSTANCE into the task
      * binary (`addReferenceObj`), so without this every task thread would
      * deserialize a private copy and build a private trie — 32 concurrent
      * builds OOMed the 2·10⁴-pattern probe. Collapse all deserialized
      * copies into the one per-JVM cached instance. */
    private def readResolve: Object = AcAutomaton.forPatterns(patterns)
  }

  object AcAutomaton {
    private val EmptyInts = new Array[Int](0)

    /** Per-JVM instance cache keyed by the pattern list: all deserialized
      * expression copies (one per task thread under codegen) share ONE
      * compiled automaton. Bounded by distinct pattern LISTS in live
      * plans — a handful — not by pattern count. Access-ordered LRU with
      * single-eldest eviction: a 9th concurrent screen evicts only the
      * coldest list, never the hot ones (a full clear() would let 32 task
      * threads rebuild large automatons repeatedly — the spike the cache
      * exists to prevent). Calls are per expression INSTANCE (lazy val +
      * readResolve), not per row, so the lock is uncontended in practice. */
    private val MaxLists = 8
    private val cache =
      new java.util.LinkedHashMap[Seq[String], AcAutomaton](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Seq[String], AcAutomaton]): Boolean =
          size() > MaxLists
      }

    def forPatterns(patterns: Seq[String]): AcAutomaton = cache.synchronized {
      val hit = cache.get(patterns)
      if (hit != null) hit
      else {
        val built = new AcAutomaton(patterns)
        cache.put(patterns, built)
        built
      }
    }
  }

  /** `multi_literal_matches(text, patterns)` → array<int> of matched
    * pattern ids (distinct, ascending; empty array for no match, null for
    * null input). Codegen calls the shared automaton via a reference
    * object, so the expression stays inside WholeStageCodegen. */
  case class MultiLiteralMatches(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"multi_literal_matches requires a string input, got ${child.dataType}")

    @transient private lazy val automaton = AcAutomaton.forPatterns(patterns)

    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        automaton.matchedIds(input.asInstanceOf[UTF8String].toString))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ac = ctx.addReferenceObj("acAutomaton", automaton, classOf[AcAutomaton].getName)
      nullSafeCodeGen(ctx, ev, s => {
        val ids = ctx.freshName("ids")
        s"""
           |int[] $ids = $ac.matchedIdsJava($s.toString());
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($ids);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `multi_literal_count(text, patterns)` → INT count of distinct
    * patterns found in `text` — the count-only twin of
    * [[MultiLiteralMatches]] (no per-row array materialization; per-row
    * cost O(n + matches), INDEPENDENT of K — the property the ≥10⁴-snippet
    * scale probe pins). */
  case class MultiLiteralCount(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"multi_literal_count requires a string input, got ${child.dataType}")

    @transient private lazy val automaton = AcAutomaton.forPatterns(patterns)

    override protected def nullSafeEval(input: Any): Any =
      automaton.matchedCount(input.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ac = ctx.addReferenceObj("acAutomaton", automaton, classOf[AcAutomaton].getName)
      nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ac.matchedCountJava($s.toString());")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry: ids of the `patterns` found in `text`. */
  def multi_literal_matches(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiLiteralMatches(ColumnBridge.expression(text), patterns))

  /** Column-API entry: count of distinct `patterns` found in `text`. */
  def multi_literal_count(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiLiteralCount(ColumnBridge.expression(text), patterns))
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Fixtures, SparkSuite}
import graft.functions.Bpe.BpeCoder
import graft.operators.TextAnalysis

/** Real-BPE encoder + trainer (round 12). The independent referee for the
  * encoder is java.lang.String.replace over the `<sym>` delimited form —
  * replace() has exactly the pinned left-to-right non-overlapping pass
  * semantics, and it shares no code with the coder's array loop. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  /** Independent replay: wrap chars, fold each merge as a literal
    * String.replace, count symbols. */
  private def replayCount(w: String, merges: Seq[(String, String)]): Int = {
    val wrapped = w.map(c => s"<$c>").mkString
    val done = merges.foldLeft(wrapped) { case (s, (a, b)) =>
      s.replace(s"<$a><$b>", s"<$a$b>")
    }
    done.count(_ == '<')
  }

  test("encoder: coder matches the String.replace replay on every fixture word") {
    val coder = new BpeCoder(Bpe.DemoMerges)
    val fixture = Fixtures.table(spark, dir, "documents")
      .select(explode(expr("regexp_extract_all(text, '([a-zA-Z]+)', 1)")).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(fixture.length > 20, "fixture should have a vocabulary")
    // plus an exhaustive synthetic sweep: every 3-char string over the
    // alphabet the merge table touches (covers pass-ordering interactions
    // the 31-word synthetic fixture cannot), and stacked-merge long forms
    val alpha = "theinorsagldmvbucwfy"
    val synth =
      (for (a <- alpha; b <- alpha; c <- alpha) yield s"$a$b$c") ++
      Seq("theother", "nation", "stationing", "running", "illness", "ssss",
          "thethethe", "erserser", "ingthing", "mentment", "Xthe", "theX")
    (fixture ++ synth).foreach { w =>
      assert(coder.wordTokenCount(w) == replayCount(w, Bpe.DemoMerges),
        s"ordered-pass divergence on '$w'")
    }
  }

  test("encoder: merges actually compress — known words hit known segmentations") {
    val coder = new BpeCoder(Bpe.DemoMerges)
    // "the": (t,h) -> [th,e]; (th,e) -> [the]
    assert(coder.wordTokenCount("the") == 1)
    // "The": uppercase T never merges (case-sensitive table) -> [T,he]
    assert(coder.wordTokenCount("The") == 2)
    // "hello": (h,e) -> [he,l,l,o]; (l,l) -> [he,ll,o]
    assert(coder.wordTokenCount("hello") == 3)
    // single char and un-mergeable junk stay put
    assert(coder.wordTokenCount("a") == 1)
    assert(coder.wordTokenCount("zqxj") == 4)
  }

  test("encoder: whole-text scanner matches the shared regex dialect") {
    val coder = new BpeCoder(Bpe.DemoMerges)
    val re = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]".r
    val texts = Fixtures.table(spark, dir, "documents")
      .select("text").limit(50).collect().map(_.getString(0)) ++
      Seq("", "   ", "a1b2!", "tab\there\nnew", "12345", "...", "Mixed CASE words")
    texts.foreach { t =>
      val expected = re.findAllIn(t).map { tok =>
        if (tok.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
          coder.wordTokenCount(tok).toLong
        else 1L
      }.sum
      assert(coder.countTokens(t) == expected, s"scanner divergence on '$t'")
    }
  }

  test("expression: codegen path agrees with the coder, null-safe") {
    import spark.implicits._
    val coder = new BpeCoder(Bpe.DemoMerges)
    val df = Seq(Some("the thing 42!"), Some(""), None)
      .toDF("text")
      .select(col("text"), Bpe.bpe_token_count(col("text")).as("n"))
      .collect()
    assert(df(0).getLong(1) == coder.countTokens("the thing 42!"))
    assert(df(1).getLong(1) == 0L)
    assert(df(2).isNullAt(1))
  }

  test("trainer: learned merges match a driver brute force on a tiny corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("bpe_tiny").toString
    import spark.implicits._
    val texts = Seq("low lower lowest", "low low slow", "newest newer new", "the lowest ebb")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val k = 4
    val got = TextAnalysis.bpeTrain(spark, tmp, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

    // brute force: word-freq map, then k rounds of pair-count + argmax + merge
    var vocab: Map[Vector[String], Long] = texts
      .flatMap("[a-zA-Z]+".r.findAllIn(_))
      .groupBy(identity).map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
    val expected = (1 to k).map { rank =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
          case _ =>
        }
      }
      val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.map { case (syms, cnt) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) { out += l + r; j += 2 }
          else { out += syms(j); j += 1 }
        }
        out.toVector -> cnt
      }.groupBy(_._1).map { case (s, m) => s -> m.map(_._2).sum }
      (rank.toLong, l, r, l + r, c)
    }
    assert(got.toSeq == expected)
    // the tiny corpus must actually learn its dominant bigrams
    assert(got.head._2 + got.head._3 == "lo" || got.head._4 == "ow" || got.head._4 == "lo")
  }

  test("downstream: pack_sequences_bpe conserves per-lang token streams") {
    val packed = TextAnalysis.packSequencesBpe(spark, dir).collect()
    val coder = new BpeCoder(Bpe.DemoMerges)
    val docs = Fixtures.table(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), coder.countTokens(r.getString(2))))
    val byId = docs.map(d => d._1 -> d._3).toMap
    packed.foreach { r =>
      assert(r.getLong(r.fieldIndex("tokens")) == byId(r.getLong(0)))
    }
    // per lang: offsets are the exclusive prefix sums in doc_id order
    packed.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      var acc = 0L
      sorted.foreach { r =>
        assert(r.getLong(r.fieldIndex("stream_offset")) == acc)
        assert(r.getLong(r.fieldIndex("window_id")) == acc / 2048)
        acc += r.getLong(r.fieldIndex("tokens"))
      }
    }
  }
}

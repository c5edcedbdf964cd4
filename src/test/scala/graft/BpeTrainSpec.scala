package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** [[BpeTrain]] pinned against a single-threaded reference trainer
  * (the gate records rows-only for this operator — THIS differential
  * is its correctness oracle): greedy merge fold, deterministic
  * argmax, exhaustion, and full merge-table parity on a random corpus. */
class BpeTrainSpec extends GraftSuite {
  import spark.implicits._

  /** Reference trainer: same tokenization contract as graft_tokens for
    * the ASCII space-separated fixtures used here. */
  private def refTrain(texts: Seq[String], merges: Int, minCount: Long)
      : Seq[(Long, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (w.split("").toVector :+ BpeTrain.EndOfWord, ws.size.toLong)
      }
    val out = mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < merges && !done) {
      val pc = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          pc(p) = pc.getOrElse(p, 0L) + f
        }
      }
      val cands = pc.toSeq.filter(_._2 >= minCount)
      if (cands.isEmpty) done = true
      else {
        val ((l, r), n) = cands.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, l + r, n))
        def greedy(s: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          b.result()
        }
        words = words.map { case (s, f) => (greedy(s), f) }
        rank += 1
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], merges: Int, minCount: Long) =
    BpeTrain.train(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", merges, minCount)
      .orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq

  test("hand-checked first merges") {
    // "low" x5, "lower" x2: (l,o)=7 wins rank 0, then (lo,w)=7
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower")
    val got = run(texts, 3, 1L)
    assert(got(0) == (0L, "l", "o", "lo", 7L))
    assert(got(1) == (1L, "lo", "w", "low", 7L))
    // after "low": low</w> x5 vs lower: (low,e)=2 ties (low,</w>)=5?
    // no — (low,</w>)=5 beats it
    assert(got(2) == (2L, "low", BpeTrain.EndOfWord,
      "low" + BpeTrain.EndOfWord, 5L))
  }

  test("greedy non-overlapping merge within a round: aaaa -> aa,aa") {
    val df = Seq(Seq("a", "a", "a", "a"), Seq("a", "a", "a"))
      .toDF("syms")
    val merged = df.select(BpeTrain.mergePair(col("syms"), "a", "a")
      .as("m")).as[Seq[String]].collect().toSet
    assert(merged == Set(Seq("aa", "aa"), Seq("aa", "a")))
  }

  test("exhaustion: minCount above every pair count stops early") {
    val got = run(Seq("ab", "cd"), 10, 2L)
    assert(got.isEmpty)
  }

  test("encode ≡ reference apply; pieces concatenate back to the word") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    def word() = (0 until (1 + rnd.nextInt(5)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val texts = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(6))).map(_ => word()).mkString(" "))
    val merges = refTrain(texts, 15, 2L).map(m => (m._2, m._3))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeTrain.encode(docs, merges)
      .as[(Long, Long, Long, String)].collect().toSet
    // reference apply: greedy fold per merge in rank order
    def applyAll(w: String): Vector[String] = {
      var syms = w.split("").toVector :+ BpeTrain.EndOfWord
      merges.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.result()
      }
      syms
    }
    val exp = texts.zipWithIndex.flatMap { case (t, d) =>
      t.split("\\s+").filter(_.nonEmpty).zipWithIndex.flatMap {
        case (w, wp) => applyAll(w).zipWithIndex.map { case (p, pp) =>
          (d.toLong, wp + 1L, pp + 1L, p)
        }
      }
    }.toSet
    assert(got == exp)
    // concatenation invariant on the distributed output
    val rebuilt = BpeTrain.encode(docs, merges)
      .orderBy("doc_id", "word_pos", "piece_pos")
      .groupBy("doc_id", "word_pos")
      .agg(concat_ws("", sort_array(collect_list(
        struct(col("piece_pos"), col("piece")))).getField("piece"))
        .as("w"))
      .select("w").as[String].collect()
    assert(rebuilt.forall(_.endsWith(BpeTrain.EndOfWord)))
  }

  test("full merge-table parity with the reference trainer, random corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    def word() = (0 until (1 + rnd.nextInt(6)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val texts = (1 to 120).map(_ =>
      (1 to (1 + rnd.nextInt(8))).map(_ => word()).mkString(" "))
    val exp = refTrain(texts, 25, 2L)
    val got = run(texts, 25, 2L)
    assert(got == exp, s"\ngot:  ${got.take(8)}\nref:  ${exp.take(8)}")
  }
}

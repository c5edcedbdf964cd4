package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differential proof that the native graft_ngrams kernel is
  * byte-identical to the composable chain it replaced, on adversarial
  * inputs: every java-\s whitespace kind, runs of separators, leading/
  * trailing whitespace, uppercase (lowercase path), multi-byte UTF-8,
  * docs shorter than n, empty and null text. */
class NgramShinglesSpec extends GraftSuite {
  import spark.implicits._

  /** The pre-kernel formulation, kept verbatim as the reference. */
  private def chain(n: Int): Column = {
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k =>
            element_at(toks, i + k)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  private val whitespace = " \t\n\r\f"
  private val words =
    Vector("a", "B", "cc", "Ée", "中文", "x1", "YY", "z")

  test("kernel output equals the composable chain on random texts") {
    val rnd = new scala.util.Random(42)
    val texts = (0 until 200).map { _ =>
      val nWords = rnd.nextInt(8)
      val sb = new StringBuilder
      if (rnd.nextBoolean()) sb += whitespace(rnd.nextInt(6))
      (0 until nWords).foreach { w =>
        sb ++= words(rnd.nextInt(words.size))
        (0 to rnd.nextInt(2)).foreach(_ =>
          sb += whitespace(rnd.nextInt(6)))
      }
      sb.toString
    } :+ "" :+ "   " :+ "single" :+ "UPPER lower MiXeD case here"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- 1 to 4) {
      val both = df.select(col("doc_id"),
        call_function("graft_ngrams", col("text"), lit(n)).as("got"),
        chain(n).as("want"))
      val bad = both.filter(not(col("got") === col("want"))).collect()
      assert(bad.isEmpty,
        s"n=$n mismatches: ${bad.take(3).mkString("; ")}")
    }
  }

  test("null text yields null; consumers drop it either way") {
    // raw-expression nulls differ from the chain (whose when(null)
    // guard falls through to the empty-array branch), but every
    // consumer filters size(grams) > 0, under which null and empty
    // are the same dropped row — assert exactly that contract
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c")))
      .toDF("doc_id", "text")
    val g = call_function("graft_ngrams", col("text"), lit(2))
    assert(df.select(g.as("g")).collect()
      .count(_.isNullAt(0)) == 1, "null text → null array")
    val survivors = df.select(col("doc_id"), g.as("grams"), chain(2).as("w"))
      .filter(size(col("grams")) > 0)
    assert(survivors.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(df.select(col("doc_id"), chain(2).as("grams"))
      .filter(size(col("grams")) > 0)
      .collect().map(_.getLong(0)).toSeq == Seq(2L),
      "chain consumer-level behavior identical")
  }

  test("graft_tokens equals the split/filter chain (multiplicity kept)") {
    val rnd = new scala.util.Random(7)
    val texts = (0 until 150).map { _ =>
      (0 until rnd.nextInt(7)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(whitespace(rnd.nextInt(whitespace.length)).toString)
    } :+ "" :+ " \t " :+ "dup dup dup" :+ "A a A"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val chainToks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val bad = df.select(
      call_function("graft_tokens", col("text")).as("got"),
      chainToks.as("want"))
      .filter(not(col("got") === col("want"))).collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("graft_top_ngram_count equals the explode/groupBy reference") {
    val rnd = new scala.util.Random(11)
    val texts = (0 until 150).map { _ =>
      (0 until rnd.nextInt(10)).map(_ => words(rnd.nextInt(4)))
        .mkString(" ")
    } :+ "" :+ "dup dup dup" :+ "A a A b" :+ "x y x y x"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- 1 to 3) {
      // reference: count every gram position via the (pre-kernel)
      // chain WITHOUT distinct, take the max per doc, 0 when no grams
      val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
      val grams = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k =>
            element_at(toks, i + k)): _*)))
        .otherwise(array().cast("array<string>"))
      val want = df.select(col("doc_id"), explode_outer(grams).as("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(max(when(col("g").isNotNull, col("count"))
          .otherwise(0L)).as("want"))
      val got = df.select(col("doc_id"),
        call_function("graft_top_ngram_count", col("text"), lit(n))
          .as("got"))
      val bad = got.join(want, Seq("doc_id"))
        .filter(col("got") =!= col("want")).collect()
      assert(bad.isEmpty, s"n=$n: ${bad.take(3).mkString("; ")}")
    }
  }

  test("graft_rep_metrics equals the separate kernels field by field") {
    val rnd = new scala.util.Random(23)
    val texts = (0 until 150).map { _ =>
      (0 until rnd.nextInt(9)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(whitespace(rnd.nextInt(whitespace.length)).toString)
    } :+ "" :+ "dup dup dup" :+ "x y x y x"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = call_function("graft_rep_metrics", col("text"))
    val bad = df.select(
      m.getField("n_tokens").as("g_n"),
      m.getField("top_word_n").as("g_w"),
      m.getField("top2_n").as("g_2"),
      m.getField("distinct3").as("g_3"),
      size(call_function("graft_tokens", col("text"))).cast("long").as("w_n"),
      call_function("graft_top_ngram_count", col("text"), lit(1)).as("w_w"),
      call_function("graft_top_ngram_count", col("text"), lit(2)).as("w_2"),
      size(call_function("graft_ngrams", col("text"), lit(3))).cast("long")
        .as("w_3"))
      .filter(col("g_n") =!= col("w_n") || col("g_w") =!= col("w_w") ||
        col("g_2") =!= col("w_2") || col("g_3") =!= col("w_3"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("resolves in SQL text via the session extension") {
    assert(spark.sql("SELECT graft_ngrams('one two three', 2) AS g")
      .collect().head.getSeq[String](0) == Seq("one two", "two three"))
  }
}

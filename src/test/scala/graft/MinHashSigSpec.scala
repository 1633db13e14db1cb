package graft

import org.apache.spark.sql.functions._

import graft.sql.MinHashSig

/** The one-pass MinHash expression against an independent derivation
  * of the same spec, plus the MinHash containment properties. */
class MinHashSigSpec extends SparkSpecBase {

  /** Independent (naive) derivation: build the shingle list
    * explicitly, hash with the same seeded XXH64, take minima. */
  private def naive(text: String, k: Int): Seq[Long] = {
    val toks = graft.text.TextRules.splitWs(text)
    val shingles =
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    (0 until k).map { i =>
      shingles.map { s =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, i)
      }.min
    }
  }

  private def sigOf(texts: Seq[String]): Map[String, Seq[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(col("text"), MinHashSig.sig(col("text"), 8).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
  }

  test("expression == independent naive derivation") {
    val texts = Seq(
      "der alte Mann und das Meer und der Wind",
      "ein zwei",            // < 3 tokens
      "",                    // empty
      "  viel   Weißraum \t hier und da  ",
      "ſ ic) Fraktur-Zeichen drei vier fünf")
    val got = sigOf(texts)
    texts.foreach { t =>
      assert(got(t) == naive(t, 8), s"signature of '$t'")
    }
  }

  test("Md5MinHash expression == the built-in HOF md5 composition (oracle parity)") {
    import spark.implicits._
    val texts = Seq(
      "der alte Mann und das Meer und der Wind",
      "ein zwei", "", "  viel   Weißraum \t hier  ",
      "a b c d e f g h i j k l m n")
    val df = texts.toDF("text")
    // independent HOF reconstruction of the signature semantics
    val tk = split(trim(col("text")), "\\s+")
    val sh = when(size(tk) >= 3,
      array_distinct(transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", slice(tk, i, lit(3))))))
      .otherwise(array(array_join(tk, " ")))
    val hof = df.select(col("text") +: (0 until 8).map(i =>
      array_min(transform(sh, x => md5(concat(lit(s"$i:"), x)))).as(s"h$i")): _*)
      .collect().map(r => r.getString(0) -> (1 to 8).map(r.getString)).toMap
    val expr = df.select(col("text"),
      graft.sql.Md5MinHash.sig(col("text"), 8).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    texts.foreach(t => assert(expr(t) == hof(t).toSeq, s"md5 signature of '$t'"))
  }

  test("SimHash16 expression == the built-in HOF bit-vote composition") {
    import spark.implicits._
    val texts = Seq(
      "der alte Mann und das Meer und der Wind der",
      "ein", "", "ſ ic) Zeichen drei vier",
      (0 until 200).map(i => s"w$i").mkString(" "))
    val df = texts.toDF("text")
    val hs = transform(array_distinct(split(trim(col("text")), "\\s+")),
      x => conv(substring(md5(x), 1, 4), 16, 10).cast("long"))
    val bits = (0 until 16).map { j =>
      when(aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << j)).otherwise(0L)
    }
    val hof = df.select(col("text"), bits.reduce(_ + _).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expr = df.select(col("text"), graft.sql.SimHash16.sim(col("text")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach(t => assert(expr(t) == hof(t), s"simhash of '$t'"))
  }

  test("identical documents share the full signature; token order matters") {
    val a = "aaa bbb ccc ddd eee fff"
    val b = "fff eee ddd ccc bbb aaa"
    val got = sigOf(Seq(a, b))
    assert(got(a) == sigOf(Seq(a))(a)) // deterministic
    assert(got(a) != got(b))           // shingles are order-sensitive
  }

  test("expression == HOF on generator corpus texts (all profiles)") {
    import spark.implicits._
    val texts = (0L until 80L).map { i =>
      val profile = Seq("uniform", "interleaved", "skewed", "edge")((i % 4).toInt)
      graft.gen.CorpusGen.genDoc(i, profile, 13L, 800)
        .spans.map(_.text).mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // md5 minhash vs HOF
    val tk = split(trim(col("text")), "\\s+")
    val sh = when(size(tk) >= 3,
      array_distinct(transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", slice(tk, i, lit(3))))))
      .otherwise(array(array_join(tk, " ")))
    val hof = df.select(col("id") +: (0 until 8).map(i =>
      array_min(transform(sh, x => md5(concat(lit(s"$i:"), x)))).as(s"h$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    val expr = df.select(col("id"), graft.sql.Md5MinHash.sig(col("text"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // simhash vs HOF
    val hs = transform(array_distinct(tk),
      x => conv(substring(md5(x), 1, 4), 16, 10).cast("long"))
    val simBits = (0 until 16).map { j =>
      when(aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << j)).otherwise(0L)
    }
    val simHof = df.select(col("id"), simBits.reduce(_ + _).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val simExpr = df.select(col("id"), graft.sql.SimHash16.sim(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shingle expression vs HOF shingles (set equality; order is
    // first-occurrence on both, but consumers are order-insensitive)
    val shHof = df.select(col("id"), sh.as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val shExpr = df.select(col("id"), graft.sql.Shingles.of(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (0L until 80L).foreach { i =>
      assert(expr(i) == hof(i), s"md5 minhash of doc $i")
      assert(simExpr(i) == simHof(i), s"simhash of doc $i")
      assert(shExpr(i) == shHof(i), s"shingles of doc $i")
    }
  }

  test("near-dup documents collide on most minima (containment)") {
    val base = (0 until 50).map(i => s"tok$i").mkString(" ")
    val nearDup = base + " extra"
    val got = sigOf(Seq(base, nearDup))
    val shared = got(base).zip(got(nearDup)).count { case (x, y) => x == y }
    assert(shared >= 5, s"only $shared/8 minima shared")
  }
}

package graft.corpus

import graft.SparkSpec

/** Corpus.learnBpeMerges: the distributed merge loop must agree with an
  * independent single-threaded BPE trainer (greedy non-overlapping
  * left-to-right merges, count-then-lexicographic argmax) and behave
  * greedily on overlapping runs. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE trainer over a weighted word dictionary. */
  private def reference(words: Seq[String], nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    var dict: Map[Vector[String], Long] =
      words.groupBy(identity).map { case (w, ws) => w.split("").toVector -> ws.length.toLong }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((step, a, b, a + b, cnt))
        dict = dict.map { case (syms, n) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2 // greedy left-to-right, non-overlapping
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> n
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def learn(words: Seq[String], nMerges: Int) =
    Corpus.learnBpeMerges(
      words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text"),
      nMerges)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("agrees with the single-threaded reference trainer") {
    // classic BPE corpus: 'es' then 'est' then 'lo' emerge
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    for (k <- Seq(1, 3, 5)) {
      assert(learn(words, k) == reference(words, k), s"nMerges=$k")
    }
  }

  test("greedy non-overlap on runs: 'aaa' yields one pair, leftmost first") {
    val words = Seq("aaa", "aaa")
    val m = learn(words, 2)
    // step 1 merges (a,a) with count 2 PER word under greedy pair
    // counting... the dictionary counts overlapping occurrences the
    // standard way: adjacent positions (2 per 'aaa' word), then the
    // replace pass fuses only the leftmost, leaving 'aa a'
    assert(m.head._2 == "a" && m.head._3 == "a" && m.head._4 == "aa")
    assert(m == reference(words, 2))
  }

  test("symbol histogram after merges matches the reference segmentation") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // reference: re-run merges on the dictionary, then count symbols
    var dict: Map[Vector[String], Long] =
      words.groupBy(identity).map { case (w, ws) => w.split("").toVector -> ws.length.toLong }
    for ((_, a, b, _, _) <- reference(words, 3)) {
      dict = dict.map { case (syms, n) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.result() -> n
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    val want = dict.toSeq.flatMap { case (syms, n) => syms.map(_ -> n) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val got = Corpus.bpeSymbolHistogram(
      words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text"), 3)
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("merged symbols participate in later merges (multi-char fusion)") {
    val words = Seq.fill(4)("abab")
    val m = learn(words, 2)
    assert(m.map(r => (r._2, r._3, r._4)) ==
      Seq(("a", "b", "ab"), ("ab", "ab", "abab")))
    assert(m == reference(words, 2))
  }

  test("bpeEncodeStats: per-doc symbol counts replay the merges; boundaries never fuse") {
    // corpus trains 'lo' (5+2+2=9? -> actual argmax by counts) — replay
    // single-threaded to get per-word encoded lengths, then check docs
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val merges = reference(words, 3).map(r => (r._2, r._3))
    def encode(w: String): Int = {
      var syms = w.split("").toVector
      for ((a, b) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    // docs carry MULTIPLE tokens — per-doc symbols must be the sum of
    // per-token encodes (a cross-boundary fuse would read fewer)
    val docs = Seq((1L, "low lower"), (2L, "newest newest widest"), (3L, "low"))
      .toDF("doc_id", "text")
    val got = Corpus.bpeEncodeStats(docs, 3)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2, encode("low") + encode("lower"))))
    assert(got(2L) == ((3, 2 * encode("newest") + encode("widest"))))
    assert(got(3L) == ((1, encode("low"))))
    // adversarial boundary: token ends in 'a', next starts with 'b',
    // while (a,b) is a learned merge of THIS corpus
    val ab = Seq.fill(4)("ab")
    val abMerge = reference(ab, 1)
    assert(abMerge.head._2 == "a" && abMerge.head._3 == "b")
    val bdocs = Seq((1L, "xa by")).toDF("doc_id", "text")
      .unionByName(ab.zipWithIndex.map { case (w, i) => (100L + i, w) }.toDF("doc_id", "text"))
    val bgot = Corpus.bpeEncodeStats(bdocs, 1)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r._3).toMap
    // "xa by": tokens xa, by -> symbols x,a,b,y = 4 (the a|b boundary
    // must NOT merge); the "ab" docs encode to 1 symbol each
    assert(bgot(1L) == 4)
    assert((100L to 103L).forall(bgot(_) == 1))
  }

  /** Reference BATCHED trainer mirroring the engine's round contract:
    * rank pairs by (count DESC, a, b), take the top 4·batch as
    * candidates, greedily accept pairwise-independent ones (no symbol
    * read or produced twice) up to batch, apply sequentially. */
  private def referenceBatched(words: Seq[String], nMerges: Int,
                               batch: Int): Seq[(Int, String, String, String, Long)] = {
    var dict: Map[Vector[String], Long] =
      words.groupBy(identity).map { case (w, ws) => w.split("").toVector -> ws.length.toLong }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 0
    var exhausted = false
    def applyMerge(a: String, b: String): Unit =
      dict = dict.map { case (syms, n) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.result() -> n
      }.groupMapReduce(_._1)(_._2)(_ + _)
    while (step < nMerges && !exhausted) {
      val want = math.min(batch, nMerges - step)
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val cand = counts.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.take(want * 4)
      if (cand.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val accepted = cand.iterator.filter { case ((a, b), _) =>
          val ok = !used(a) && !used(b) && !used(a + b)
          if (ok) { used += a; used += b; used += (a + b) }
          ok
        }.take(want).toSeq
        for (((a, b), c) <- accepted) {
          step += 1
          out += ((step, a, b, a + b, c))
          applyMerge(a, b)
        }
        if (accepted.isEmpty) exhausted = true
      }
    }
    out.result()
  }

  test("batched merges match the batched reference; independence keeps counts exact") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq.fill(4)("abab")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    for (b <- Seq(2, 4, 8)) {
      val got = Corpus.learnBpeMerges(df, nMerges = 8, batch = b)
        .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
      assert(got == referenceBatched(words, 8, b), s"batch=$b\n$got")
    }
    // batch=1 IS strict greedy: identical to the unbatched reference
    val g1 = Corpus.learnBpeMerges(df, nMerges = 6, batch = 1)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(g1 == reference(words, 6))
    // every accepted pair's recorded count is the TRUE pre-application
    // count (independence guarantee): replay each batched merge on the
    // reference dict built from all earlier merges and compare counts
    val batched = referenceBatched(words, 8, 4)
    var dict: Map[Vector[String], Long] =
      words.groupBy(identity).map { case (w, ws) => w.split("").toVector -> ws.length.toLong }
    for ((_, a, b, _, recorded) <- batched) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      assert(counts((a, b)) == recorded, s"stale count for ($a,$b)")
      dict = dict.map { case (syms, n) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.result() -> n
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
  }
}

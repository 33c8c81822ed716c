package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CmsHash, GraftExpressions}
import graft.operators.Search

/** Search-operator gates: count-min sketch soundness (the ≥-true-count
  * guarantee that makes sketch-guided exact recounts exact), heavy
  * hitters ≡ plain exact groupBy, two-phase top-k ≡ single-window
  * top-k, BM25 scores vs an independent driver-side recomputation, and
  * the plan shapes the 100 TB story rests on (broadcast postings
  * lookup, partial sketch aggregation).
  */
class SearchSpec extends AnyFunSuite {
  import TestSession._

  private val Depth = 4
  private val Width = 64 // deliberately tiny: forces collisions

  test("count-min estimate never undercounts, even with forced collisions") {
    import spark.implicits._
    // Zipf-ish multiset over a domain (1024) far wider than the sketch
    val elems = (1 to 4000).map(i => (i % 1024).toLong * 2654435761L)
    val df = elems.toDF("h").repartition(7)
    val sketch = df
      .agg(GraftExpressions.cmsSketchAgg(col("h"), Depth, Width).as("sk"))
      .head().getSeq[Long](0).toArray
    val exact = elems.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = df.distinct()
      .withColumn("est", GraftExpressions.cmsEstimateLong(col("h"), sketch, Depth, Width))
      .as[(Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (h, e) =>
      assert(e >= exact(h), s"estimate $e < true count ${exact(h)} for $h")
    }
    // tiny width ⇒ at least one collision actually overestimates,
    // otherwise this test exercises nothing
    assert(est.exists { case (h, e) => e > exact(h) },
      "sketch too wide for the domain — collisions unexercised")
  }

  test("sketch merge is partition-count independent") {
    import spark.implicits._
    val elems = (1 to 2000).map(i => (i % 300).toLong)
    def sketchWith(parts: Int): Array[Long] = elems.toDF("h").repartition(parts)
      .agg(GraftExpressions.cmsSketchAgg(col("h"), Depth, Width).as("sk"))
      .head().getSeq[Long](0).toArray
    assert(sketchWith(1).sameElements(sketchWith(13)))
  }

  test("interpreted estimate equals codegen'd estimate") {
    import spark.implicits._
    // the probe's generated Java inlines CmsHash.slot — pin agreement
    val sketch = (0 until Depth * Width).map(_.toLong % 17).toArray
    val hashes = (-50L to 50L).map(_ * 0x9e3779b97f4a7c15L)
    val fromExpr = hashes.toDF("h")
      .withColumn("est", GraftExpressions.cmsEstimateLong(col("h"), sketch, Depth, Width))
      .as[(Long, Long)].collect().toMap
    hashes.foreach { x =>
      val manual = (0 until Depth)
        .map(d => sketch(d * Width + CmsHash.slot(x, d, Width))).min
      assert(fromExpr(x) == manual, s"codegen/interpreted drift at $x")
    }
  }

  test("heavy hitters equals the plain exact groupBy") {
    import spark.implicits._
    val hh = Search.heavyHitters(spark, sf)
      .select("bigram", "bigram_ct").as[(String, Long)].collect()
    assert(hh.nonEmpty, "no heavy hitters at sf0.001 — threshold miscalibrated")
    val docs = graft.sources.Tables.documents(spark, sf)
    val exactAll = Search.bigramsOn(docs)
      .groupBy("bigram").agg(count(lit(1)).as("ct"))
      .as[(String, Long)].collect().toMap
    val total = exactAll.values.sum
    val threshold = math.ceil(total / 800.0).toLong
    val expected = exactAll.filter(_._2 >= threshold)
    assert(hh.toMap == expected,
      s"sketch-guided set (${hh.length}) != exact set (${expected.size})")
    // and the sketch actually pruned: candidates must be a strict
    // subset of the full stream (estimates bounded ⇒ some light
    // bigrams fall below threshold at the probe)
    assert(hh.length < exactAll.size)
  }

  test("derived workload: 4 queries x 3 slots, q4 repeats a term, p3 repeats a token") {
    val wl = Search.searchWorkloadSeq(spark, sf).toMap
    assert(wl.keySet == Set("q1", "q2", "q3", "q4"))
    wl.values.foreach(t => assert(t.split(" ").length == 3, s"bad qtext: $t"))
    // the rank-13 double slot must arrive as a literal repetition —
    // the dedupe-before-scoring contract needs a real duplicate
    val q4 = wl("q4").split(" ")
    assert(q4.toSet.size == 2 && q4(0) == q4(1), s"q4 not repeated: ${wl("q4")}")
    val pw = Search.phraseWorkloadSeq(spark, sf).toMap
    assert(pw.keySet == Set("p1", "p2", "p3"))
    val p3 = pw("p3").split(" ")
    assert(p3.length == 2 && p3(0) == p3(1), s"p3 not an equal-token phrase: ${pw("p3")}")
    // every phrase must actually occur in the corpus (the derivation's
    // point: no dead queries, at any sf)
    import spark.implicits._
    val hits = Search.phraseSearch(spark, sf)
      .select("pid").distinct().as[String].collect().toSet
    assert(hits == pw.keySet, s"phrases with no occurrences: ${pw.keySet -- hits}")
  }

  test("two-phase top-k equals single-window top-k") {
    import spark.implicits._
    val scored = Search.bm25ScoredOn(
      graft.sources.Tables.documents(spark, sf), Search.searchWorkloadSeq(spark, sf))
    import org.apache.spark.sql.expressions.Window
    val single = scored.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score_fp").desc, col("doc_id"))))
      .filter(col("rk") <= 10)
      .select("qid", "rk", "doc_id", "score_fp")
      .as[(String, Int, Long, Long)].collect().sorted
    val two = Search.topKTwoPhase(scored, 10)
      .select("qid", "rk", "doc_id", "score_fp")
      .as[(String, Int, Long, Long)].collect().sorted
    assert(two.nonEmpty && two.sameElements(single))
  }

  test("did-you-mean: every misspelling recovers its source word at rank 1") {
    import spark.implicits._
    val r = Search.didYouMean(spark, sf)
      .as[(String, String, Long, String, Long, Long)].collect()
    assert(r.nonEmpty)
    // each (seed, probe) group: the seed itself must be the top
    // suggestion — it is within distance ≤ 2 of its own typo and is by
    // construction among the most frequent words
    r.groupBy(x => (x._1, x._2)).foreach { case ((seed, probe), rs) =>
      val top = rs.minBy(_._3)
      assert(top._4 == seed, s"probe $probe suggests ${top._4}, wanted $seed")
      // all suggestions honor the distance gate and the ranking order
      rs.foreach(x => assert(x._6 <= 2))
      rs.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 > b._5 || (a._5 == b._5 && a._4 < b._4))
        case _ => ()
      }
    }
    // both typo modes present for all 5 seeds
    assert(r.map(x => (x._1, x._2)).distinct.length == 10)
  }

  test("PMI collocations: driver-side recount of counts and ratio ordering") {
    import spark.implicits._
    val got = Search.pmiPairs(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.size <= 50)
    // recount from raw text with the same tokenizer
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(lower($"text")).as[String].collect()
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val ts = t.split(" ", -1)
      ts.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      ts.sliding(2).foreach {
        case Array(a, b) => val k = s"$a $b"; bi(k) = bi.getOrElse(k, 0L) + 1
        case _ => ()
      }
    }
    got.foreach { case (bg, ab, a, b, _) =>
      assert(ab == bi(bg), s"$bg pair count")
      val Array(w1, w2) = bg.split(" ", 2)
      assert(a == uni(w1) && b == uni(w2), s"$bg unigram counts")
      assert(ab >= 5)
    }
    // high-PMI pairs really co-occur disproportionately: top result's
    // observed pair probability exceeds the independence baseline
    val nTok = uni.values.sum.toDouble
    val nBg = bi.values.sum.toDouble
    val top = got.head
    assert(top._2 / nBg > (top._3 / nTok) * (top._4 / nTok),
      "top PMI pair not above independence")
    // descending pmi with bigram tiebreak
    got.sliding(2).foreach {
      case Seq(x, y) =>
        assert(x._5 > y._5 || (x._5 == y._5 && x._1 < y._1))
      case _ => ()
    }
  }

  test("MMR selection matches a driver-side greedy reference bit-for-bit") {
    import spark.implicits._
    val got = Search.mmrRerank(spark, sf)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // rebuild pool/rel/sims from the same primitives and run the
    // greedy loop in plain Scala with the identical IEEE operations
    val scored = Search.bm25ScoredOn(
      graft.sources.Tables.documents(spark, sf), Search.searchWorkloadSeq(spark, sf))
    val cand = Search.topKTwoPhase(scored, 20)
      .select("qid", "doc_id", "score_fp").as[(String, Long, Long)].collect()
    val qv = graft.operators.Similarity
      .quantizedOn(graft.sources.Tables.embeddings(spark, sf))
      .filter(col("nrm") > 0)
      .select("vec_id", "q", "nrm").as[(Long, Seq[Long], Long)].collect()
      .map { case (id, q, n) => id -> ((q.toArray, n)) }.toMap
    val want = cand.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val pool = rows.collect { case (_, d, fp) if qv.contains(d) => (d, fp) }
      val maxFp = pool.map(_._2).max
      val rel = pool.map { case (d, fp) => d -> (fp.toDouble / maxFp.toDouble) }.toMap
      def sim(a: Long, b: Long): Double = {
        val (qa, na) = qv(a); val (qb, nb) = qv(b)
        val dot = qa.indices.foldLeft(0L)((acc, i) => acc + qa(i) * qb(i))
        dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      }
      val first = pool.map(_._1).sortBy(d => (-rel(d), d)).head
      var sel = Vector((qid, 1L, first, 0.7 * rel(first)))
      for (step <- 2 to 5) {
        val chosen = sel.map(_._3).toSet
        val remaining = pool.map(_._1).filterNot(chosen)
        if (remaining.nonEmpty) {
          val best = remaining
            .map(d => (d, (0.7 * rel(d)) - (0.3 * chosen.map(s => sim(d, s)).max)))
            .sortBy { case (d, m) => (-m, d) }.head
          sel :+= ((qid, step.toLong, best._1, best._2))
        }
      }
      sel
    }
    assert(got.sorted == want.sorted,
      s"engine=${got.sorted.take(3)}… reference=${want.sorted.take(3)}…")
    // each query yields 5 distinct docs
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length == 5 && rs.map(_._3).distinct.length == 5, s"$q")
    }
  }

  test("TopKAgg retrieval top-k == two-phase salted windows (the agg generalizes)") {
    import spark.implicits._
    // the same exact semantics from two different scale strategies:
    // salted double-window vs the k-bounded typed aggregate. The agg
    // plan shuffles ≤k (score, doc) pairs per (partition, qid); the
    // salted form shuffles ≤ salt·k rows per query into the final
    // window. Both beat the naive global-per-qid window; equality here
    // pins that they answer identically (ties and all).
    val scored = Search.bm25ScoredOn(
      graft.sources.Tables.documents(spark, sf), Search.searchWorkloadSeq(spark, sf))
    val two = Search.topKTwoPhase(scored, 10)
      .select("qid", "rk", "doc_id", "score_fp")
      .as[(String, Int, Long, Long)].collect().sorted.toSeq
    val viaAgg = scored
      .groupBy("qid")
      .agg(graft.functions.GraftExpressions.topkAgg(
        col("score_fp").cast("double"), lpad(col("doc_id").cast("string"), 12, "0"), 10).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).as("rk"),
        col("col.tag").cast("long").as("doc_id"), col("col.score").cast("long").as("score_fp"))
      .as[(String, Int, Long, Long)].collect().sorted.toSeq
    assert(viaAgg == two)
  }

  test("BM25 fixed-point scores match an independent driver-side recomputation") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }.toMap
    val n = corpus.size.toLong
    val totDl = corpus.values.map(_.size.toLong).sum
    val avgdl = totDl.toDouble / n.toDouble
    def detLn(x0: Double): Double = {
      var v = x0
      var i = 0
      while (i < 20) { v = math.sqrt(v); i += 1 }
      (v - 1.0) * 1048576.0
    }
    def expectedScore(terms: Seq[String], toks: Seq[String]): (Long, Long) = {
      // repeated query terms score ONCE (q4 pins this)
      val matched = terms.distinct.filter(toks.contains)
      val fps = matched.map { term =>
        val dfv = corpus.values.count(_.contains(term)).toDouble
        val tf = toks.count(_ == term).toDouble
        val dl = toks.size.toDouble
        val idf = detLn(1.0 + (n.toDouble - dfv + 0.5) / (dfv + 0.5))
        val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        math.floor(idf * tfn * 1000000.0).toLong
      }
      (fps.sum, matched.size.toLong)
    }
    val workload = Search.searchWorkloadSeq(spark, sf)
    val got = Search.bm25ScoredOn(docs, workload)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val byQid = workload.toMap
    got.foreach { case (qid, docId, scoreFp, mt) =>
      val (expFp, expMt) = expectedScore(byQid(qid).split(" ").toSeq, corpus(docId))
      assert(scoreFp == expFp && mt == expMt,
        s"$qid doc $docId: engine ($scoreFp, $mt) != reference ($expFp, $expMt)")
    }
  }

  test("plan shapes: broadcast postings lookup; sketch partial-aggregates") {
    val bmPlan = Search.bm25TopK(spark, sf).queryExecution.executedPlan.toString
    assert(bmPlan.contains("BroadcastHashJoin"),
      "postings lookup must broadcast the query terms")
    assert(!bmPlan.contains("CartesianProduct"),
      "corpus-stats attach must stay a broadcast, not a cartesian")
    import spark.implicits._
    val skPlan = (1L to 10L).toDF("h")
      .agg(GraftExpressions.cmsSketchAgg(col("h"), Depth, Width))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(skPlan.contains("partial_cmssketchagg"),
      "sketch build must map-side partial-aggregate")
  }

  test("phrase search equals a driver-side sliding-window recount") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toVector }.toMap
    val phrases = Search.phraseWorkloadSeq(spark, sf)
    val got = Search.phraseOccurrencesOn(docs, phrases)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val expected = (for {
      (pid, ptext) <- phrases
      p = ptext.split(" ").toVector
      (id, toks) <- corpus
      starts = (0 to toks.size - p.size).filter(i => toks.slice(i, i + p.size) == p)
      if starts.nonEmpty
    } yield (pid, id, starts.size.toLong, starts.head.toLong)).toSet
    assert(got.toSet == expected,
      s"engine ${got.length} rows != naive ${expected.size} rows")
  }

  test("related queries equal a driver-side overlap recount, all pairs present") {
    import spark.implicits._
    val top = Search.bm25TopK(spark, sf, k = 10)
      .select("qid", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val got = Search.relatedQueries(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    val qids = top.keys.toSeq.sorted
    assert(got.length == qids.combinations(2).size, "every query pair gets a row")
    got.foreach { case (a, b, ov, na, nb, j) =>
      val inter = top(a).intersect(top(b)).size
      assert(ov == inter && na == top(a).size && nb == top(b).size, s"pair ($a,$b)")
      assert(math.abs(j - inter.toDouble / (na + nb - inter)) < 1e-12)
    }
  }

  test("snippets equal a driver-side best-window recount") {
    import spark.implicits._
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toVector }.toMap
    val queries = Search.searchWorkloadSeq(spark, sf)
      .map { case (qid, qtext) => qid -> qtext.split(" ").toSet }.toMap
    val top = Search.bm25TopK(spark, sf, k = 5)
      .select("qid", "doc_id").as[(String, Long)].collect()
    val got = Search.snippets(spark, sf)
      .as[(String, Long, Long, Long, String)].collect()
    assert(got.length == top.length, "one snippet per result-page row")
    val expected = top.map { case (qid, docId) =>
      val toks = corpus(docId)
      val terms = queries(qid)
      val starts = toks.indices.filter(i => terms(toks(i)))
      val scored = starts.map { s =>
        (s, toks.slice(s, s + Search.SnippetWindow).toSet.intersect(terms).size)
      }
      val (bs, bc) = scored.minBy { case (s, c) => (-c, s) }
      (qid, docId, bs.toLong, bc.toLong,
        toks.slice(bs, bs + Search.SnippetWindow).mkString(" "))
    }.toSet
    assert(got.toSet == expected, "engine snippets diverge from naive recount")
  }

  test("phrase search counts OVERLAPPING occurrences") {
    import spark.implicits._
    val one = Seq((1L, "x batch batch batch batch y"), (2L, "batch batch"))
      .toDF("doc_id", "text")
    val got = Search.phraseOccurrencesOn(one, Seq("p3" -> "batch batch batch"))
      .as[(String, Long, Long, Long)].collect().toSet
    // starts 1 and 2 overlap inside the 4-token run; doc 2 is too short
    assert(got == Set(("p3", 1L, 2L, 1L)))
  }

  test("count-min sketch over a STREAM: at-rest grid = batch grid (state-store round trip)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    // bigrams arrive in two micro-batches; the sketch buffer must
    // survive serialize/deserialize through the streaming state store,
    // and the at-rest grid must equal the batch aggregation of the
    // union — the ingest-time form of the heavy-hitter pass 1
    val all = Search.bigramsOn(graft.sources.Tables.documents(spark, sf))
      .as[String].collect()
    val (b1, b2) = all.splitAt(all.length / 2)
    val mem = MemoryStream[String](spark)
    val sk = mem.toDF().toDF("bigram")
      .agg(GraftExpressions.cmsSketchAgg(
        xxhash64(col("bigram")), Search.CmsDepth, Search.CmsWidth).as("sk"))
    val q = sk.writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("cms_stream").head().getSeq[Long](0)
      val want = all.toSeq.toDF("bigram")
        .agg(GraftExpressions.cmsSketchAgg(
          xxhash64(col("bigram")), Search.CmsDepth, Search.CmsWidth).as("sk"))
        .head().getSeq[Long](0)
      assert(got == want, "streamed sketch diverges from batch sketch")
      assert(got.sum > 0)
    } finally q.stop()
  }

  test("index maintenance over a STREAM of docs: at-rest postings = batch rebuild") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    // documents arrive online in two micro-batches; the per-(term,
    // doc) tf aggregation is the index-build shuffle running as ONE
    // stateful operator, and at rest it must equal the batch tf frame
    // the serving tier memoizes
    val all = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val (b1, b2) = all.splitAt(all.length / 2)
    val mem = MemoryStream[(Long, String)](spark)
    val tfStream = Search.bm25Index(mem.toDF().toDF("doc_id", "text"))._1
    val q = tfStream.writeStream.format("memory").queryName("postings_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("postings_stream")
        .as[(String, Long, Long, Long)].collect().toSet
      val want = Search.bm25Index(graft.sources.Tables.documents(spark, sf))._1
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got.nonEmpty && got == want,
        "streamed postings diverge from the batch index build")
    } finally q.stop()
  }

  test("BM25 serving over a STREAM of queries: at-rest scores = batch scores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    // queries arrive online in two micro-batches and probe the STATIC
    // materialized index (stream-static joins + one stateful agg) —
    // the retrieval-serving shape; at rest it must equal the batch
    // scoring of the same query set
    val (tf, tdf, stats) = Search.indexFrames(spark, sf)
    // the SAME data-driven workload table the batch tier serves,
    // arriving online (r10 task #3's streaming leg)
    val workload = Search.searchWorkloadSeq(spark, sf)
    val mem = MemoryStream[(String, String)](spark)
    val served = Search.bm25ServeOn(mem.toDF().toDF("qid", "qtext"), tf, tdf, stats)
    val q = served.writeStream.format("memory").queryName("bm25_serve_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(workload.take(2)); q.processAllAvailable()
      mem.addData(workload.drop(2)); q.processAllAvailable()
      val got = spark.table("bm25_serve_stream")
        .as[(String, Long, Long, Long)].collect().toSet
      val want = Search.bm25ScoredOn(
          graft.sources.Tables.documents(spark, sf), workload)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got.nonEmpty && got == want,
        "streamed BM25 scores diverge from batch scores")
    } finally q.stop()
  }

  test("postings index: df/cf/top posting agree with a driver-side rebuild") {
    import spark.implicits._
    val got = Search.postings(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }
    got.foreach { case (token, df, cf, topDoc, topTf) =>
      val per = corpus.map { case (id, toks) => id -> toks.count(_ == token).toLong }
        .filter(_._2 > 0)
      assert(df == per.size && cf == per.map(_._2).sum, s"df/cf wrong for '$token'")
      val best = per.minBy { case (id, t) => (-t, id) }
      assert((topDoc, topTf) == best, s"top posting wrong for '$token'")
    }
  }

  test("round-9 late query plans: no cartesian, no lambda fallback, broadcast where claimed") {
    import graft.operators.{Analytic, Dedup, Governance, Similarity}
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val shapes = Seq(
      "phrase" -> plan(Search.phraseSearch(spark, sf)),
      "postings" -> plan(Search.postings(spark, sf)),
      "hybrid" -> plan(Search.hybridRerank(spark, sf)),
      "heavy" -> plan(Search.heavyHitters(spark, sf)),
      "editdist" -> plan(Dedup.editDistancePairs(spark, sf)),
      "hardneg" -> plan(Similarity.hardNegatives(spark, sf)),
      "hopping" -> plan(Analytic.hoppingWindow(spark, sf)),
      "anomaly" -> plan(Analytic.anomalyHours(spark, sf)),
      "erasure" -> plan(Governance.erasureReport(spark, sf)))
    shapes.foreach { case (n, p) =>
      assert(!p.contains("CartesianProduct"), s"$n plan has a cartesian join")
      assert(!p.contains("MapPartitions") && !p.contains("DeserializeToObject"),
        s"$n plan fell out of codegen into lambda execution")
    }
    // the probes that must broadcast: phrase terms into the token
    // frame, victim set into every table, per-type moments back onto
    // the hourly frame
    Seq("phrase", "erasure", "anomaly").foreach { n =>
      assert(shapes.toMap.apply(n).contains("BroadcastHashJoin"), s"$n lost its broadcast")
    }
  }

  test("hybrid rerank: anchor ranks itself first with sim 1.0") {
    import spark.implicits._
    val h = Search.hybridRerank(spark, sf)
      .select("qid", "rk", "doc_id", "sim")
      .as[(String, Int, Long, Double)].collect()
    assert(h.nonEmpty)
    val top = h.filter(_._2 == 1)
    assert(top.nonEmpty)
    top.foreach { case (qid, _, _, sim) =>
      assert(math.abs(sim - 1.0) < 1e-12, s"$qid anchor self-sim $sim != 1.0")
    }
  }

  test("incremental postings == full in-engine rebuild over v2") {
    import graft.operators.Curation
    val docs = graft.sources.Tables.documents(spark, sf)
    val v2 = Curation.snapshotV2On(docs)
    val full = Search.postingsOn(
      v2.selectExpr("doc_id", "explode(split(lower(text), ' ')) AS token")
        .groupBy("token", "doc_id").agg(count(lit(1)).as("tf")))
      .orderBy("token").collect().toSeq
    val inc = Search.incrementalPostings(spark, sf).collect().toSeq
    assert(inc == full, "incremental carry/recompute split diverges from full rebuild")
    // the maintenance path must not touch every doc: the diff has
    // unchanged docs (the overwhelming majority), whose postings rows
    // arrive via the carried anti-join, not re-tokenization
    val st = Curation.snapshotDiff(spark, sf).groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.getOrElse("unchanged", 0L) > st.values.sum / 2,
      s"fixture should be mostly unchanged docs, got $st")
  }

  test("tfidf keywords: TopKAgg form == window row_number recompute; no Window node") {
    val viaAgg = Search.tfidfKeywords(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_fp").desc, col("term"))
    val docs = graft.sources.Tables.documents(spark, sf)
    val tok = docs.selectExpr("doc_id", "explode(split(lower(text), ' ')) AS term")
    val tf = tok.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val vdf = tf.groupBy("term").agg(count(lit(1)).as("dfv"))
    val nDocs = docs.count().toDouble
    // engine's detLn, recomputed inline (20 iterated sqrts)
    val ratio = lit(nDocs) / col("dfv").cast("double")
    val ln = ((1 to 20).foldLeft(ratio)((c, _) => sqrt(c)) - lit(1.0)) * lit(1048576.0)
    val scored = tf.join(vdf, "term")
      .withColumn("score_fp", col("tf") * floor(ln * lit(1000000.0)).cast("long"))
    val windowed = scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("score_fp"))
      .orderBy(col("doc_id"), col("rk"))
      .collect().toSeq
    assert(viaAgg.collect().toSeq == windowed)
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "tfidf plan must not contain a window sort")
  }
}

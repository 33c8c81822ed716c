package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.sources.Tables
import graft.streaming.Stateful
import graft.streaming.Stateful.Keyed

/** Semantics gates for the curation operators, on planted fixtures
  * where the expected outcome is known by construction (the DuckDB
  * oracles prove engine ≡ SQL on the real corpus; these prove the
  * SQL means what the scaladoc claims).
  */
class CurationSpec extends AnyFunSuite {
  import TestSession._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("block dedup drops the later copy of a shared block, keeps first, reassembles in order") {
    import spark.implicits._
    val shared = words("boiler", 16) // one exact 16-word block
    val docs = Seq(
      (1L, shared + " " + words("a", 16)),           // first owner of the shared block
      (2L, words("b", 16) + " " + shared),           // later copy -> dropped
      (3L, words("c", 20))                            // untouched (16 + partial 4)
    ).toDF("doc_id", "text")
    val out = Curation.blockDedupOn(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 2L, 0L, shared + " " + words("a", 16))))
    assert(out(1) == ((2L, 2L, 1L, 1L, words("b", 16))))
    assert(out(2) == ((3L, 2L, 2L, 0L, words("c", 20))))
    // idempotence: dedup of the cleaned corpus drops nothing
    val again = Curation.blockDedupOn(
      out.toSeq.toDF("doc_id", "block_ct", "kept_ct", "dropped_ct", "text")
        .filter(length(col("text")) > 0).select("doc_id", "text"))
    assert(again.agg(sum("dropped_ct")).first.getLong(0) == 0L)
  }

  test("block dedup: duplicate block within ONE doc also collapses to first occurrence") {
    import spark.implicits._
    val b = words("x", 16)
    val out = Curation.blockDedupOn(Seq((7L, b + " " + b)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, String)].head()
    assert(out == ((7L, 2L, 1L, 1L, b)))
  }

  test("pack shards equals the sequential prefix sum and is partition-count independent") {
    import spark.implicits._
    val docs = Tables_docs()
    val got = Curation.packShardsOn(docs)
      .select("doc_id", "tok_ct", "tok_offset", "shard_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // sequential reference on the driver
    val toks = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    var off = 0L
    val exp = toks.map { case (id, t) =>
      val r = (id, t, off, off / Curation.ShardTokens); off += t; r
    }
    assert(got.toSeq == exp.toSeq)
    // same answer regardless of input partitioning
    val repart = Curation.packShardsOn(docs.repartition(13))
      .select("doc_id", "tok_ct", "tok_offset", "shard_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(repart.toSeq == got.toSeq)
  }

  test("incremental pack: splice == full repack; carried rows are the stored base, untouched") {
    import spark.implicits._
    val inc = Curation.packIncremental(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // append-splice exactness: drop the flag and it IS the full pack
    val full = Curation.packShards(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(inc.map(r => (r._1, r._2, r._3, r._4)).toSeq == full.toSeq)
    // carried == below the append cutoff, and both sides are non-empty
    val cut = full.map(_._1).max * 9 / 10
    assert(inc.forall(r => r._5 == (r._1 <= cut)))
    assert(inc.exists(_._5) && inc.exists(!_._5))
    // stability: the carried slice equals the stored v1 pack verbatim
    // (it is unioned from the memo, never recomputed — the O(delta)
    // maintenance contract)
    val stored = Curation.packShardsOn(
      Tables.spread(spark, Tables.documents(spark, sf)).filter(col("doc_id") <= cut))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(inc.filter(_._5).map(r => (r._1, r._2, r._3, r._4)).toSeq == stored.toSeq)
  }

  test("incremental pack: folding the splice over N appends == one-shot pack") {
    import spark.implicits._
    val docs = Tables.spread(spark, Tables.documents(spark, sf))
      .select(col("doc_id"), col("text"))
    val ids = docs.select("doc_id").as[Long].collect().sorted
    // four append batches by id quartile — every batch non-empty
    val cuts = Seq(ids(ids.length / 4), ids(ids.length / 2), ids(3 * ids.length / 4))
    val batches = Seq(
      docs.filter(col("doc_id") <= cuts(0)),
      docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1) && col("doc_id") <= cuts(2)),
      docs.filter(col("doc_id") > cuts(2)))
    val empty = Curation.packShardsOn(docs.limit(0))
    val folded = batches.foldLeft(empty) { (pack, delta) =>
      // localCheckpoint plays the role of the stored table between
      // micro-batches (the AdsStore publish in a streaming deployment)
      Curation.packSplice(pack, delta).drop("carried").localCheckpoint()
    }
    val got = folded.as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val oneShot = Curation.packShardsOn(docs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == oneShot.toSeq,
      "N-batch splice fold diverged from the one-shot pack")
  }

  test("chunk pack: sequential over (doc, chunk) order, doc chunks contiguous") {
    import spark.implicits._
    val got = Curation.chunkPack(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // reference: sequential prefix sum over the chunk frame in
    // (doc_id, chunk_index) order
    val chunks = graft.operators.TextAnalysis.chunkRag(spark, sf)
      .select("doc_id", "chunk_index", "chunk_token_ct")
      .as[(Long, Long, Long)].collect().sortBy(c => (c._1, c._2))
    var off = 0L
    val exp = chunks.map { case (d, ci, t) =>
      val r = (d, ci, t, off, off / Curation.ShardTokens); off += t; r
    }
    assert(got == exp.toSeq)
    // a document's chunks land in non-decreasing shard ids with
    // contiguous offsets (the trainer reads one doc's context in order)
    got.groupBy(_._1).foreach { case (d, rs) =>
      val s = rs.sortBy(_._2)
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._4 == a._4 + a._3, s"doc $d offsets not contiguous")
          assert(b._5 >= a._5, s"doc $d shard order")
        case _ => ()
      }
    }
  }

  test("incremental chunks == full re-chunk of v2; only the delta is re-chunked") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, sf)
    val v2 = Curation.snapshotV2On(docs)
    val got = TextAnalysis.chunkIncremental(spark, sf)
      .select($"doc_id", $"chunk_index", $"chunk_text", $"snapped_text")
      .as[(Long, Long, String, String)].collect().sorted.toSeq
    val want = TextAnalysis.chunkRagOn(v2)
      .select($"doc_id", $"chunk_index", $"chunk_text", $"snapped_text")
      .as[(Long, Long, String, String)].collect().sorted.toSeq
    assert(got.nonEmpty && got == want)
    // the fixture's diff classes all occur, so the splice is exercised
    // on real removals, revisions, and additions
    val classes = Curation.snapshotDiff(spark, sf)
      .select("status").distinct().as[String].collect().toSet
    assert(classes == Set("added", "removed", "changed", "unchanged"))
  }

  test("weighted sample: keys bit-match a driver recompute; weighting biases toward heavy docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val got = TextAnalysis.sampleWeighted(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size == 50 && got.map(_._1).distinct.size == 50)
    // driver recompute: same fnv+avalanche, same iterated-sqrt ln
    def fnv(s: String): Long = {
      var h = java.lang.Long.parseUnsignedLong("14695981039346656037")
      s.foreach(ch => h = (h ^ ch.toLong) * 1099511628211L)
      h
    }
    def hash32(s: String): Long = {
      var x = fnv(s)
      x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
      x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
      x ^= (x >>> 33)
      x >>> 32
    }
    def detLn(v: Double): Double = {
      var x = v
      (1 to 20).foreach(_ => x = math.sqrt(x))
      (x - 1.0) * 1048576.0
    }
    val all = TextAnalysis.textStats(spark, sf)
      .select($"doc_id", $"token_ct").as[(Long, Long)].collect()
    val want = all.map { case (id, w) =>
      val u = (hash32(s"d$id") + 1L).toDouble / 4294967296.0
      (id, w, (0.0 - detLn(u)) / w.toDouble)
    }.sortBy(r => (r._3, r._1)).take(50).toSeq
    assert(got == want)
    // token-mass weighting bites: the sample's mean token count beats
    // the corpus mean (heavy docs overrepresented)
    val sampleMean = got.map(_._2).sum.toDouble / got.size
    val corpusMean = all.map(_._2).sum.toDouble / all.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("distribution drift: identity is exactly 0; disjoint vocabularies hit ln 2") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta")).toDF("doc_id", "text")
    // JS(P, P) = 0 to the bit: every pp == pq ⇒ pp/m == 1 ⇒ detLn == 0
    val same = Curation.distDriftOn(a, a)
      .select($"js_divergence").as[Double].head()
    assert(same == 0.0, s"identity drift $same")
    // fully disjoint vocabularies: JS = ln 2 (detLn ≈ ln within 1e-6)
    val b = Seq((1L, "zeta eta theta"), (2L, "iota kappa lambda")).toDF("doc_id", "text")
    val disjoint = Curation.distDriftOn(a, b)
      .select($"js_divergence").as[Double].head()
    assert(math.abs(disjoint - math.log(2.0)) < 1e-3, s"disjoint drift $disjoint")
    // the fixture crawl: small but strictly positive (rev2/new tokens)
    val fx = Curation.distDrift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    assert(fx._7 > 0.0 && fx._7 < 0.1 && fx._5 > 0)
  }

  test("pack shards: every shard except the last fills to its capacity boundary") {
    import spark.implicits._
    val m = Curation.shardManifest(spark, sf)
      .select("shard_id", "token_sum").as[(Long, Long)].collect().sortBy(_._1)
    // contiguous shard ids from 0
    assert(m.map(_._1).toSeq == m.indices.map(_.toLong))
    // a doc never splits, so shard k closes only once its last doc's
    // END crosses the (k+1)·capacity boundary — every shard except the
    // last must reach its boundary, and each shard's first doc must
    // START inside [k·capacity, (k+1)·capacity)
    val C = Curation.ShardTokens
    val ends = Curation.packShards(spark, sf)
      .groupBy(col("shard_id"))
      .agg(max(col("tok_offset") + col("tok_ct")).as("end"),
        min(col("tok_offset")).as("start"))
      .select("shard_id", "start", "end")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val last = ends.last._1
    ends.foreach { case (k, start, end) =>
      assert(start >= k * C && start < (k + 1) * C, s"shard $k starts at $start")
      if (k != last) assert(end >= (k + 1) * C, s"shard $k closed early at $end")
    }
  }

  test("pii scan finds exactly the planted fixtures; redaction removes every hit") {
    import spark.implicits._
    val scan = Curation.piiScan(spark, sf)
    val bad = scan.filter(
      (col("email_ct") =!= when(col("doc_id") % 3 === 0, 1L).otherwise(0L)) ||
      (col("phone_ct") =!= when(col("doc_id") % 5 === 0, 1L).otherwise(0L)) ||
      (col("ip_ct") =!= when(col("doc_id") % 7 === 0, 1L).otherwise(0L))).count()
    assert(bad == 0L, "scan counts diverge from the planted fixture")
    // redacted text has zero remaining matches and the placeholders
    // appear exactly where the scan counted hits
    val re = Curation.piiRedact(spark, sf)
      .withColumn("email_left", size(regexp_extract_all(col("redacted"), lit(Curation.EmailRe), lit(0))))
      .withColumn("phone_left", size(regexp_extract_all(col("redacted"), lit(Curation.PhoneRe), lit(0))))
      .withColumn("ip_left", size(regexp_extract_all(col("redacted"), lit(Curation.IpRe), lit(0))))
    assert(re.filter(col("email_left") + col("phone_left") + col("ip_left") > 0).count() == 0L)
    val placeholders = re.filter(col("doc_id") % 3 === 0)
      .filter(!col("redacted").contains("[EMAIL]")).count()
    assert(placeholders == 0L)
  }

  test("quantization: reconstruction error bounded by half a quantization step") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = Curation.quantize(spark, sf)
    // recompute per-element reconstruction error directly
    val err = emb
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x)))"))
      .filter(col("scale") > 0)
      .withColumn("max_err", expr(
        """array_max(transform(v, x ->
          |  abs(x - cast(floor(x / scale * 127.0d + 0.5d) as double) * scale / 127.0d)))""".stripMargin))
      .withColumn("step", col("scale") / 127.0)
      .filter(col("max_err") > col("step") * 0.5 + 1e-12)
    assert(err.count() == 0L, "an element exceeded half-step reconstruction error")
    // saturation bookkeeping: |q| = 127 must occur (the max element always saturates)
    assert(q.filter(col("scale") > 0 && col("saturated_ct") === 0).count() == 0L)
  }

  test("streaming ingest block dedup: D1 firstWins keep-set == batch keeper set") {
    import spark.implicits._
    // the Dolma pass at ingest: blocks arrive in (doc_id, block_idx)
    // order, keyed by block hash; first-wins state keeps exactly the
    // batch keepers. Arrival order must match the batch tiebreak for
    // the equality to be exact (a reordered stream keeps a different —
    // but equally valid — representative per block).
    val docs = Tables_docs().filter(col("doc_id") < 60)
    val blocks = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(0, cast(ceil(size(toks) / 16.0d) as int) - 1),
            |  i -> array_join(slice(toks, i * 16 + 1, 16), ' '))""".stripMargin))
          .as(Seq("block_idx", "bstr")))
    val keyed = blocks.select(
        md5(col("bstr")).as("key"),
        // event time encodes arrival order: one tick per (doc, block).
        // Base offset keeps every ts strictly above the initial
        // watermark (0): the stateful late-row filter drops ts <= wm,
        // so an epoch-0 event would silently vanish from batch 1.
        timestamp_millis(lit(1000L) + col("doc_id") * 1000L + col("block_idx")).as("ts"),
        format_string("%06d:%04d", col("doc_id"), col("block_idx")).as("payload"))
      .as[Keyed].collect().sortBy(_.payload)
    val mem = MemoryStream[Keyed](spark)
    // ttl far beyond the fixture's time span: eviction must not
    // resurrect a block between distant micro-batches
    val q = Stateful.firstWins(
        mem.toDS().withWatermark("ts", "0 seconds").as[Keyed], ttlMillis = 1000000000L)
      .writeStream.format("memory").queryName("block_first_wins")
      .outputMode(OutputMode.Append).start()
    keyed.grouped(200).foreach { chunk => mem.addData(chunk.toSeq); q.processAllAvailable() }
    q.stop()
    val got = spark.table("block_first_wins").as[Keyed].collect().map(_.payload).toSet
    val exp = blocks
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("bstr")))
          .orderBy(col("doc_id"), col("block_idx"))))
      .filter(col("rn") === 1)
      .select(format_string("%06d:%04d", col("doc_id"), col("block_idx")))
      .as[String].collect().toSet
    assert(got == exp, s"stream kept ${got.size} blocks, batch kept ${exp.size}")
  }

  test("lm surprisal: common tokens score low, rare higher, OOV highest — exact planted bits") {
    import spark.implicits._
    // train corpus = even doc_ids: vocab {a: 4, b: 1}, total 5, bits(5)=3
    val docs = Seq(
      (0L, "a a a a b"), // trained on
      (1L, "a a"),       // common only: surprisal 0 per token
      (3L, "b b"),       // rare: 3-1 = 2 bits per token
      (5L, "zzz")        // OOV: 3 bits
    ).toDF("doc_id", "text")
    val got = Curation.lmSurprisalOn(docs)
      .select("doc_id", "tok_ct", "oov_ct", "surprisal_bits")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 5L, 0L, 2L), (1L, 2L, 0L, 0L), (3L, 2L, 0L, 4L), (5L, 1L, 1L, 3L)))
  }

  test("bigram LM backoff: exact planted bits for seen-bigram, backoff, OOV and doc-start") {
    import spark.implicits._
    // train = doc 0 "a b a b": U(a)=2, U(b)=2, T=4 (3 bits),
    // B(a,b)=2 (2 bits), B(b,a)=1 (1 bit)
    val docs = Seq(
      (0L, "a b a b"), // 1 + 0 + (2-1) + 0 = 2 bits, no backoff
      (1L, "a b"),     // usurp(a)=1, seen (a,b): 2-2=0 -> 1 bit
      (3L, "b b"),     // 1, unseen (b,b): 1+usurp(b)=2 -> 3 bits, 1 backoff
      (5L, "zzz a")    // OOV 3, unseen (zzz,a): 1+1=2 -> 5 bits, 1 backoff
    ).toDF("doc_id", "text")
    val got = Curation.lmBigramOn(docs)
      .select("doc_id", "tok_ct", "backoff_ct", "surprisal_bits")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 4L, 0L, 2L), (1L, 2L, 0L, 1L), (3L, 2L, 1L, 3L), (5L, 2L, 1L, 5L)))
  }

  test("epoch shuffle: exact permutation, partition-independent, epochs independent") {
    import spark.implicits._
    val docs = Tables_docs()
    val n = docs.count()
    val got = Curation.epochShuffleOn(docs)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    // positions are exactly 0..n-1, each once
    assert(got.map(_._2).sorted.toSeq == (0L until n).toSeq)
    // two-level rank is input-partitioning independent
    val repart = Curation.epochShuffleOn(docs.repartition(13))
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    assert(repart.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
    // a different epoch is a different permutation (not a shift/copy)
    val other = Curation.epochShuffleOn(docs, epoch = 8)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    val moved = got.sortBy(_._1).zip(other.sortBy(_._1)).count { case (a, b) => a._2 != b._2 }
    assert(moved > n / 2, s"epochs 7 and 8 nearly identical: only $moved moved")
  }

  test("mixture sample: greedy fill is tight per source; sqrt temperature favors small sources") {
    import spark.implicits._
    val rows = Curation.mixtureSample(spark, sf)
      .select("source", "tok_ct", "cum_before", "source_budget", "kept")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val budget = docs.head._4
      val keptDocs = docs.filter(_._5 == 1L)
      val keptSum = keptDocs.map(_._2).sum
      if (docs.exists(_._5 == 0L)) {
        // budget binds: kept mass reaches the budget, and dropping the
        // greedily-last kept doc would fall below it (tight fill)
        assert(keptSum >= budget, s"$src under-filled: $keptSum < $budget")
        val lastKept = keptDocs.maxBy(_._3) // largest cum_before among kept
        assert(keptSum - lastKept._2 < budget, s"$src over-filled past one doc")
      } else {
        // the whole source fits inside its budget
        assert(keptSum <= budget || keptDocs.size == docs.size)
      }
    }
    // τ=0.5 property: the smallest source keeps a fraction of its mass
    // at least as large as the biggest source's fraction
    val byMass = rows.groupBy(_._1).view.mapValues { docs =>
      val mass = docs.map(_._2).sum.toDouble
      val kept = docs.filter(_._5 == 1L).map(_._2).sum.toDouble
      (mass, kept / mass)
    }.toMap
    val smallest = byMass.minBy(_._2._1)
    val largest = byMass.maxBy(_._2._1)
    assert(smallest._2._2 >= largest._2._2 - 1e-9,
      s"sqrt temperature inverted: $smallest vs $largest")
  }

  test("LM scoring runs at ingest: STREAM of docs vs static LM ≡ batch surprisal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val docs = Tables_docs().select(col("doc_id"), col("text"))
    val (vocab, total) = Curation.lmModelOn(docs)
    val want = Curation.lmSurprisal(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val feed = docs.as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)](spark)
    val q = Curation.lmScoreOn(mem.toDF().toDF("doc_id", "text"), vocab, total)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode(OutputMode.Complete).start()
    mem.addData(feed.take(feed.size / 2)); q.processAllAvailable()
    mem.addData(feed.drop(feed.size / 2)); q.processAllAvailable(); q.stop()
    val got = spark.table("lm_stream")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(want.nonEmpty && got == want,
      s"streamed LM scores diverge: ${got.size} vs ${want.size}")
  }

  test("snapshot diff classifies by content: identity diff all-unchanged; planted crawl exact") {
    import spark.implicits._
    val docs = Tables_docs()
    // identity: diff(v1, v1) — every doc unchanged, zero churn
    val idm = Curation.snapshotDiffOn(docs, docs)
    assert(idm.filter(col("status") =!= "unchanged" || col("tok_delta") =!= 0L).count() == 0)
    // planted crawl: classification must reproduce the synthesis rules
    // (the operator itself only sees hashes and join sides)
    val rows = Curation.snapshotDiff(spark, sf)
      .select("doc_id", "status").as[(Long, String)].collect()
    rows.foreach { case (id, st) =>
      val exp =
        if (id >= 1000000000L) "added"
        else if (id % 13 == 0) "removed"
        else if (id % 11 == 0) "changed"
        else "unchanged"
      assert(st == exp, s"doc $id: $st != $exp")
    }
    assert(rows.map(_._2).toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("bpe encode: pieces round-trip to the token; exact vs driver-side merge replay") {
    import spark.implicits._
    val merges = Curation.bpeMerges(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val enc = Curation.bpeEncode(spark, sf)
      .select("token", "pieces", "n_pieces").distinct()
      .as[(String, String, Long)].collect()
    assert(enc.nonEmpty)
    // lossless: pieces concatenate back to the token; count matches
    enc.foreach { case (tok, pieces, n) =>
      assert(pieces.split(" ").mkString == tok, s"'$tok' -> '$pieces' lost chars")
      assert(pieces.split(" ").length.toLong == n)
    }
    // the merge table did real work on the fixture
    assert(enc.exists { case (tok, _, n) => n < tok.length },
      "no token was ever merged — merge table unapplied?")
    // exact: replay the learned merges driver-side per word type (the
    // same double-replace non-overlapping semantics as bpeApplyMerge)
    def applyAll(tok: String): String = {
      var s = " " + tok.toCharArray.mkString(" ") + " "
      merges.foreach { case (a, b) =>
        val pat = s" $a $b "; val rep = s" $a$b "
        s = s.replace(pat, rep).replace(pat, rep)
      }
      s.trim
    }
    enc.foreach { case (tok, pieces, _) =>
      assert(pieces == applyAll(tok), s"'$tok': got '$pieces' want '${applyAll(tok)}'")
    }
  }

  test("bpe merges: forced checkpoint cadence leaves the merge table bit-identical") {
    // the BpeCheckpointEvery lineage cap must be semantics-free:
    // every-round checkpointing == never checkpointing (the shipped
    // BpeRounds=5 never reaches the default cadence, so this is the
    // only exercise the cap gets)
    val never = Curation.bpeMerges(spark, sf, checkpointEvery = Int.MaxValue)
      .collect().map(_.toString).toSeq
    val every = Curation.bpeMerges(spark, sf, checkpointEvery = 1)
      .collect().map(_.toString).toSeq
    assert(never.nonEmpty && every == never,
      "checkpoint cadence changed the BPE merge table")
    // the APPLICATION loop's cadence too (bpeEncodedVocab)
    val vNever = Curation.bpeEncodedVocab(spark, sf, checkpointEvery = Int.MaxValue)
      .collect().map(_.toString).sorted.toSeq
    val vEvery = Curation.bpeEncodedVocab(spark, sf, checkpointEvery = 1)
      .collect().map(_.toString).sorted.toSeq
    assert(vNever.nonEmpty && vEvery == vNever,
      "checkpoint cadence changed the encoded vocabulary")
  }

  test("bpe fertility: masses recount from the encoded corpus; ratios exact") {
    import spark.implicits._
    val rep = Curation.bpeFertility(spark, sf)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    assert(rep.nonEmpty)
    val enc = Curation.bpeEncode(spark, sf)
      .select("doc_id", "token", "n_pieces").as[(Long, String, Long)].collect()
    val meta = Tables_docs().select("doc_id", "lang", "source")
      .as[(Long, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = enc.groupBy(r => meta(r._1))
      .map { case (k, rows) =>
        k -> ((rows.length.toLong, rows.map(_._3).sum, rows.map(_._2.length.toLong).sum))
      }
    // completeness: every (lang, source) slice in the corpus reports
    assert(rep.map(r => (r._1, r._2)).toSet == want.keySet)
    rep.foreach { case (lang, source, nTok, nPieces, nChars, fert, cpp) =>
      val (wTok, wPieces, wChars) = want((lang, source))
      assert((nTok, nPieces, nChars) == ((wTok, wPieces, wChars)), s"($lang,$source) mass")
      assert(fert == nPieces.toDouble / nTok.toDouble && fert >= 1.0, s"($lang,$source) fertility")
      assert(cpp == nChars.toDouble / nPieces.toDouble && cpp >= 1.0, s"($lang,$source) compression")
    }
  }

  test("bpe vocab: piece mass equals the encoded corpus; merged pieces present") {
    import spark.implicits._
    val vocab = Curation.bpeVocab(spark, sf).as[(String, Long, Long)].collect()
    assert(vocab.nonEmpty)
    // total piece mass == sum of n_pieces over the encoded corpus
    val encMass = Curation.bpeEncode(spark, sf)
      .agg(sum("n_pieces")).as[Long].head()
    assert(vocab.map(_._2).sum == encMass, "piece mass must cover the encoded corpus")
    // the vocabulary holds both merged (multi-char) and base pieces
    assert(vocab.exists(_._1.length > 1) && vocab.exists(_._1.length == 1))
    // occurrences dominate containing-type counts; both positive
    vocab.foreach { case (p, ct, wt) =>
      assert(ct >= wt && wt >= 1, s"piece '$p': ct=$ct wt=$wt")
    }
  }

  test("token ids: dense 1..V by frequency, positions dense per doc") {
    import spark.implicits._
    val ids = Curation.tokenIds(spark, sf).cache()
    try {
      // ids are a dense 1..V range over the vocabulary
      val distinctIds = ids.select("token_id").distinct()
      val v = distinctIds.count()
      val mm = distinctIds.agg(min("token_id"), max("token_id"))
        .as[(Long, Long)].head()
      assert(mm == ((1L, v)), s"ids not dense: $mm vs V=$v")
      // every doc's positions are exactly 0..len-1
      val badPos = ids.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
        .filter(col("mn") =!= 0L || col("mx") =!= col("n") - 1).count()
      assert(badPos == 0L, "a doc has non-dense positions")
      // id 1 belongs to the corpus-most-frequent token (ties by token):
      // recompute independently from the raw text
      val top = Tables_docs()
        .select(explode(split(lower(col("text")), " ")).as("t"))
        .groupBy("t").count().orderBy(col("count").desc, col("t"))
        .as[(String, Long)].head()
      val id1ct = ids.filter(col("token_id") === 1L).count()
      assert(id1ct == top._2, s"id 1 occurs $id1ct times, top token ${top._1} ${top._2}")
    } finally ids.unpersist()
  }

  test("incremental manifest == full recompute under the frozen model; slice sizes exact") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val v1 = Tables_docs()
    val v2 = Curation.snapshotV2FullOn(v1)
    val diff = Curation.snapshotDiffOn(v1, v2).select(col("doc_id"), col("status"))
    val vocab = Curation.lmVocabShared(spark, sf)
    val total = vocab.agg(sum(col("ct")).as("total_ct"))
    val tbits = Curation.lmTotalBits(spark, sf)
    // full recompute: score EVERY v2 doc against the same frozen model
    val full = TextAnalysis.perDocSignalsOn(v2, vocab, total, tbits)
      .join(diff, "doc_id")
      .select(col("doc_id"), col("status"), col("keep"), col("reasons"),
        col("pred_lang"), col("pii_ct"), col("lm_gibberish"), col("is_benchmark"),
        col("split"), col("train_keep"))
      .collect().map(_.toString).toSet
    val incr = TextAnalysis.incrementalManifest(spark, sf)
      .collect().map(_.toString).toSet
    assert(full.nonEmpty && incr == full,
      "carrying prior rows for unchanged docs diverged from a full re-score")
    // the run's shape: every diff class present, removed docs absent,
    // and the output covers exactly v2
    val byStatus = Curation.snapshotDiffOn(v1, v2)
      .groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("added", "changed", "unchanged", "removed").subsetOf(byStatus.keySet),
      s"fixture lost a diff class: $byStatus")
    assert(incr.size == byStatus("added") + byStatus("changed") + byStatus("unchanged"))
  }

  test("best-rep dedup: exactly one keeper per component, keeper has max quality") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.bestRep(spark, sf)
      .select($"doc_id", $"rep_doc_id", $"quality_score", $"best_doc_id", $"is_keeper")
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (rep, members) =>
      val keepers = members.filter(_._5 == 1L)
      assert(keepers.length == 1, s"component $rep has ${keepers.length} keepers")
      val k = keepers.head
      // keeper is the quality argmax with min-doc_id tiebreak
      val want = members.minBy(m => (-m._3, m._1))
      assert(k._1 == want._1, s"component $rep keeper ${k._1} != argmax ${want._1}")
      assert(members.forall(_._4 == k._1), s"component $rep best_doc_id inconsistent")
    }
    // components agree with the min-label closure query
    val comp = graft.operators.Dedup.queries("dedup_components")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(rows.forall(r => comp(r._1) == r._2))
    // a component with >1 member exists where the keeper is NOT the
    // min id — the quality rule actually bites on the fixture
    assert(byComp.exists { case (_, ms) =>
      ms.length > 1 && ms.filter(_._5 == 1L).head._1 != ms.map(_._1).min
    }, "fixture never distinguishes quality-argmax from min-id — test is vacuous")
  }

  test("BPE merges: round-1 top pair matches a driver recount; merging is residual-free") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val merges = Curation.bpeMerges(spark, sf).collect()
    assert(merges.length == Curation.BpeRounds)
    // well-formed table: rounds dense 1..k, merged = p1+p2, counts > 0
    assert(merges.map(_.getLong(0)).toSeq == (1L to Curation.BpeRounds).toSeq)
    merges.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0)
    }
    // round 1 against an independent driver-side recount over raw text
    val words = Tables_docs().select($"text").as[String].collect()
      .flatMap(_.toLowerCase.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong)
    val pairCts = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { case (w, f) =>
      w.sliding(2).foreach { p =>
        if (p.length == 2)
          pairCts((p(0).toString, p(1).toString)) =
            pairCts.getOrElse((p(0).toString, p(1).toString), 0L) + f
      }
    }
    val expectTop = pairCts.toSeq
      .sortBy { case ((a, b), ct) => (-ct, s"$a $b") }.head
    assert((merges(0).getString(1), merges(0).getString(2)) == expectTop._1,
      s"round-1 pair ${merges(0).getString(1)} ${merges(0).getString(2)} != driver ${expectTop._1}")
    assert(merges(0).getLong(4) == expectTop._2)
    // the two-pass replace left NO unmerged occurrence of any merge
    // (the greedy-completeness argument in bpeApplyMerge, checked)
    val fin = Curation.bpeFinalWords(spark, sf)
    merges.foreach { r =>
      val pat = s" ${r.getString(1)} ${r.getString(2)} "
      val residual = fin.filter($"syms".contains(pat)).count()
      assert(residual == 0, s"round ${r.getLong(0)} left $residual words with '$pat'")
    }
    // merges actually happened: some word now carries a multi-char symbol
    assert(fin.filter(size(split(trim($"syms"), " ")) <
      length(regexp_replace(trim($"syms"), " ", "")) ).count() > 0)
  }

  test("chunkPack composed key: round-trips in domain, RAISES past 2^31 instead of overflowing") {
    import spark.implicits._
    // in-domain (including the largest legal doc_id): key is positive
    // and decomposes back to (doc_id, chunk_index)
    val maxDoc = (1L << 31) - 1
    val ok = Seq((0L, 0L), (42L, 7L), (maxDoc, 4095L)).toDF("doc_id", "chunk_index")
      .select(col("doc_id"), col("chunk_index"),
        Curation.chunkPackKey(col("doc_id"), col("chunk_index")).as("k"))
      .select(col("doc_id"), col("chunk_index"), col("k"),
        expr("k div 4294967296").as("d2"), (col("k") % 4294967296L).as("c2"))
      .collect()
    assert(ok.forall(r => r.getLong(2) >= 0 &&
      r.getLong(3) == r.getLong(0) && r.getLong(4) == r.getLong(1)))
    // past the domain the Long would overflow negative and break both
    // div-blocking and key order — the guard must raise, not wrap
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] {
      Seq((1L << 31, 0L)).toDF("doc_id", "chunk_index")
        .select(Curation.chunkPackKey(col("doc_id"), col("chunk_index"))).collect()
    }
    assert(msgs(ex).exists(_.contains("composed-key domain")), s"wrong failure: $ex")
  }

  private def Tables_docs() = graft.sources.Tables.documents(spark, sf)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the retrieval/packing additions: BM25 scoring, document
  * chunking, and int8 embedding quantization. Value-exactness against
  * DuckDB is the driver's gate; these pin the semantic contracts. */
class RetrievalOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  test("weighted sampling: exactly K rows, ordered keys, heavy docs " +
      "over-represented, bounded-heap plan") {
    val df = graft.ext.TextOps.corpusSampleWeighted(spark, SF)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 64)
    rows.sliding(2).foreach { case Array((i1, _, k1), (i2, _, k2)) =>
      assert(k1 > k2 || (k1 == k2 && i1 < i2))
    }
    // E-S sampling selects proportionally to weight: the selected docs'
    // mean length must exceed the corpus mean (deterministic for this
    // fixed corpus + hash)
    val corpusAvg = Tables.load(spark, SF, "documents")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val selAvg = rows.map(_._2).sum.toDouble / rows.length
    assert(selAvg > corpusAvg,
      s"selected mean $selAvg not above corpus mean $corpusAvg")
  }

  test("text_bm25 returns a 20-row ranking in (score desc, doc_id) order") {
    val rows = graft.ext.TextOps.textBm25(spark, SF)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 20)
    assert(rows.forall { case (_, s) => !s.isNaN && !s.isInfinite && s >= 0 })
    rows.sliding(2).foreach { case Array((id1, s1), (id2, s2)) =>
      assert(s1 > s2 || (s1 == s2 && id1 < id2))
    }
  }

  test("text_chunk covers every token with stride-48 starts and true lengths") {
    val chunks = graft.ext.TextOps.textChunk(spark, SF)
    // chunk_text really holds n_chunk_tokens tokens, all within [1, 64]
    assert(chunks.filter(
      size(split(col("chunk_text"), " ")) =!= col("n_chunk_tokens") ||
        col("n_chunk_tokens") < 1 || col("n_chunk_tokens") > 64).isEmpty)
    // per doc: starts are consecutive stride multiples and the final chunk
    // reaches exactly the document's token count
    val perDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("chunk_idx")).as("max_idx"),
      max(col("start_token") + col("n_chunk_tokens")).as("covered"))
    val docs = Tables.load(spark, SF, "documents")
      .select(col("doc_id"),
        (length(col("text")) - length(translate(col("text"), " ", "")) + 1)
          .as("n_tokens"))
    assert(perDoc.join(docs, "doc_id").filter(
      col("max_idx") =!= col("n_chunks") - 1 ||
        col("covered") =!= col("n_tokens")).isEmpty)
  }

  test("text_unigram_nll scores every doc; head-broadcast split changes nothing") {
    val out = graft.ext.TextOps.textUnigramNll(spark, SF)
    val docs = Tables.load(spark, SF, "documents")
    assert(out.count() == docs.count())
    // mean NLL is positive (probs < 1) and bounded by the worst smoothed
    // token logprob, -ln(1 / (T + V)) <= ln(2T)
    val rows = out.collect()
    assert(rows.forall(_.getDouble(2) > 0))
    val t = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val bound = math.log(2.0 * t)
    assert(rows.forall(_.getDouble(2) <= bound))
  }

  test("importance weights: planted two-domain corpus has the right signs") {
    import spark.implicits._
    // target (en) speaks 'tt*' words, proposal-only (de) speaks 'pp*';
    // 'mix' docs use both. A doc of pure target vocabulary must weigh
    // above 1 (log_weight > 0, target_like), pure proposal vocabulary
    // below 1 — the DSIR selection direction.
    def words(tag: String, n: Int, rep: Int) =
      (0 until n).flatMap(i => Seq.fill(rep)(s"$tag$i")).mkString(" ")
    val docs = (
      (1L to 8L).map(i => (i, "en", words("tt", 6, 3))) ++
      (9L to 16L).map(i => (i, "de", words("pp", 6, 3))) ++
      Seq((17L, "de", words("tt", 6, 2) + " " + words("pp", 2, 1)))
    ).toDF("doc_id", "lang", "text")
    val out = graft.ext.TextOps
      .importanceWeightsOf(spark, docs, "dsir_spec_planted")
      .collect().map(r =>
        (r.getLong(0), (r.getDouble(2), r.getBoolean(3)))).toMap
    (1L to 8L).foreach { i =>
      assert(out(i)._1 > 0 && out(i)._2, s"target doc $i not target_like")
    }
    (9L to 16L).foreach { i =>
      assert(out(i)._1 < 0 && !out(i)._2, s"proposal doc $i target_like")
    }
    // the mixed doc is mostly target vocabulary -> still target-like
    assert(out(17L)._2)
    // weights are a likelihood RATIO: sign flips with the domain, and
    // pure-target docs all share one score (identical token multisets)
    assert(out.filter(_._1 <= 8L).values.map(_._1).toSet.size == 1)
  }

  test("corpus_mix_weights downsamples only over-budget classes") {
    val rows = graft.ext.TextOps.corpusMixWeights(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, w, nSel, tokSel) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))
      assert(w > 0 && w <= 1.0)
      assert(nSel >= 0 && tokSel <= tok)
      // weight 1 keeps everything; fractional weight must actually drop
      if (w == 1.0) assert(tokSel == tok) else assert(tokSel < tok)
    }
  }

  test("corpus_split_assign: stable 240/8/8 split, counts partition corpus") {
    val rows = graft.ext.TextOps.corpusSplitAssign(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.load(spark, SF, "documents")
    assert(rows.map(_._3).sum == docs.count())
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 240/256 expected train share; allow generous corpus-size noise
    val trainFrac = bySplit("train").toDouble / docs.count()
    assert(trainFrac > 0.85 && trainFrac < 0.99, s"train frac $trainFrac")
    // membership is a pure function of doc_id: two runs identical
    val again = graft.ext.TextOps.corpusSplitAssign(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("text_repetition's sorted-run fold equals a direct multiset count") {
    val docs = Tables.load(spark, SF, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1))).toMap
    val got = graft.ext.TextOps.textRepetition(spark, SF).collect()
    assert(got.length == docs.count(_._2.length >= 3))
    got.foreach { r =>
      val ws = docs(r.getLong(0))
      def grams(k: Int) = ws.sliding(k).map(_.mkString(" ")).toSeq
      val g2 = grams(2); val g3 = grams(3)
      assert(r.getLong(1) == ws.length)
      // per-row fold == straightforward multiset maxima / distinct counts
      assert(r.getDouble(2) ==
        ws.groupBy(identity).values.map(_.size).max.toDouble / ws.length)
      assert(r.getDouble(3) ==
        g2.groupBy(identity).values.map(_.size).max.toDouble / g2.size)
      assert(r.getDouble(4) == (g3.size - g3.distinct.size).toDouble / g3.size)
    }
  }

  test("text_vocab_coverage: top-64 vocab bounds coverage, tokens add up") {
    val rows = graft.ext.TextOps.textVocabCoverage(spark, SF).collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, SF, "documents")
    val totTok = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    // per-lang token counts partition the corpus token stream exactly
    assert(rows.map(_.getLong(1)).sum == totTok)
    rows.foreach { r =>
      val (n, inv, oov) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(inv >= 0 && inv <= n)
      assert(oov >= 0.0 && oov <= 1.0)
      assert(math.abs(oov - (n - inv).toDouble / n) == 0.0)
    }
  }

  test("corpus_source_profile partitions the corpus exactly by source") {
    val rows = graft.ext.TextOps.corpusSourceProfile(spark, SF).collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, SF, "documents")
    // the profile is a partition of the corpus: doc counts sum to the
    // table size and token shares sum to 1 (each share is tokens/total,
    // so the sum telescopes exactly up to float rounding)
    assert(rows.map(_.getLong(1)).sum == docs.count())
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val (nDocs, nLangs, dup) = (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(nDocs > 0 && nLangs >= 1)
      assert(dup >= 0.0 && dup < 1.0) // distinct fingerprints >= 1 per source
    }
  }

  test("text_winnowing matches an independent local recompute exactly") {
    // replays hash + selection in plain Scala (MessageDigest md5, same
    // 48-bit prefix; rightmost-min winnowing) for every sf0.001 doc and
    // pins n_grams / n_selected / fp_checksum — the coverage guarantee
    // (>= 1 fingerprint per window) holds by construction of the replay
    def h48(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val expected = Tables.load(spark, SF, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 11)
      .map { case (id, ws) =>
        val hs = ws.sliding(8).map(g => h48(g.mkString(" "))).toArray
        val sel = (0 to hs.length - 4).map { st =>
          val win = hs.slice(st, st + 4)
          val m = win.min
          st + win.lastIndexOf(m)
        }.distinct
        (id, (hs.length.toLong, sel.length.toLong, sel.map(hs).sum))
      }.toMap
    val got = graft.ext.TextOps.textWinnowing(spark, SF).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    got.foreach { case (id, v) => assert(v == expected(id), s"doc $id") }
  }

  test("text_perplexity_buckets cuts strict per-language terciles") {
    val rows = graft.ext.TextOps.textPerplexityBuckets(spark, SF).collect()
      .map(r => (r.getString(1), r.getDouble(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val n = rs.length.toLong
      val by = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      def bucket(b: String): Array[Double] =
        by.getOrElse(b, Array.empty[Double])
      val nHead = bucket("head").length.toLong
      val nMid = bucket("middle").length.toLong
      assert(nHead + nMid + bucket("tail").length == n)
      // inclusive boundary: head holds at least ceil(n/3) docs, head and
      // middle together at least ceil(2n/3)
      assert(nHead >= (n + 2) / 3, s"$lang head")
      assert(nHead + nMid >= (2 * n + 2) / 3, s"$lang head+middle")
      // buckets are disjoint score ranges: every head score is strictly
      // below every middle score, middle strictly below tail
      for ((lo, hi) <- Seq(("head", "middle"), ("middle", "tail")))
        (by.get(lo), by.get(hi)) match {
          case (Some(a), Some(b)) => assert(a.max < b.min, s"$lang $lo<$hi")
          case _ => ()
        }
    }
  }

  test("text_line_dedup removes only corpus-repeated lines, reassembly is exact") {
    val out = graft.ext.TextOps.textLineDedup(spark, SF)
    val docs = Tables.load(spark, SF, "documents")
    // one row per document — fully-boilerplate docs must not vanish
    assert(out.count() == docs.count())
    // attrition arithmetic holds row by row
    assert(out.filter(col("n_kept") > col("n_lines") ||
      col("removed_frac") =!= round((col("n_lines") - col("n_kept"))
        .cast("double") / col("n_lines"), 9)).isEmpty)
    // untouched docs reassemble to the EXACT original text (segmentation
    // + sorted-struct rebuild is lossless); touched docs shrink
    val joined = out.join(docs.select(col("doc_id"), col("text")), "doc_id")
    assert(joined.filter(col("n_kept") === col("n_lines") &&
      col("cleaned_text") =!= col("text")).isEmpty)
    assert(joined.filter(col("n_kept") < col("n_lines") &&
      length(col("cleaned_text")) >= length(col("text"))).isEmpty)
    // the generator's planted near-dup spans make the operator non-vacuous
    assert(out.agg(sum(col("n_lines") - col("n_kept"))).head().getLong(0) > 0)
  }

  test("line dedup drops exactly the planted boilerplate, goldens pinned") {
    val spark2 = spark
    import spark2.implicits._
    // docs 1-3 share an 8-token header (>= K=3 docs -> boilerplate);
    // docs 1-2 also share an 8-token footer (only 2 docs -> kept);
    // doc 4 is all boilerplate (3 copies of the header would need 3 docs,
    // so give it the header alone: 1 line, dropped entirely)
    def toks(tag: String, n: Int) = (0 until n).map(i => s"$tag$i")
    val header = toks("h", 8)
    val footer = toks("f", 8)
    val docs = Seq(
      (1L, (header ++ toks("a", 8) ++ footer).mkString(" ")),
      (2L, (header ++ toks("b", 8) ++ footer).mkString(" ")),
      (3L, (header ++ toks("c", 8)).mkString(" ")),
      (4L, header.mkString(" ")),
      (5L, toks("z", 12).mkString(" "))
    ).toDF("doc_id", "text")
    val got = graft.ext.TextOps.lineDedupOf(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(got(1L) == ((3L, 2L, (toks("a", 8) ++ footer).mkString(" "))))
    assert(got(2L) == ((3L, 2L, (toks("b", 8) ++ footer).mkString(" "))))
    assert(got(3L) == ((2L, 1L, toks("c", 8).mkString(" "))))
    // fully-boilerplate doc survives as a row with empty cleaned text
    assert(got(4L) == ((1L, 0L, "")))
    // untouched doc: short final line (4 tokens) reassembles losslessly
    assert(got(5L) == ((2L, 2L, toks("z", 12).mkString(" "))))
  }

  test("text_keywords emits consecutive ranks with non-increasing weights") {
    val out = graft.ext.TextOps.textKeywords(spark, SF).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val docs = Tables.load(spark, SF, "documents").count()
    assert(out.map(_._1).distinct.length == docs)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.length <= 5)
      // ranking really follows the weight, term tie-break included
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._4 > lo._4 || (hi._4 == lo._4 && hi._3 < lo._3))
        case _ =>
      }
      // a doc never lists the same term twice
      assert(rows.map(_._3).distinct.length == rows.length)
    }
  }

  test("NB classifier is perfect on a planted separable corpus") {
    val spark2 = spark
    import spark2.implicits._
    // five classes with fully DISJOINT vocabularies: the add-1-smoothed
    // model must recover every label on its own training set
    val langs = Seq("de", "en", "es", "fr", "zh")
    val docs = (0 until 40).map { i =>
      val l = langs(i % 5)
      (i.toLong, (0 until 6).map(j => s"w_${l}_${(i + j) % 4}")
        .mkString(" "), l)
    }.toDF("doc_id", "text", "lang")
    val out = graft.ext.TextOps.nbClassifierOf(spark, docs, "nb_model_fixture")
    assert(out.count() == 40)
    assert(out.filter(col("predicted") =!= col("lang")).isEmpty)
    assert(out.filter(!col("correct")).isEmpty)
  }

  test("NB classifier never predicts a class ABSENT from the corpus " +
      "(r14 review find: NULL scores fell through the argmax to 'zh')") {
    val spark2 = spark
    import spark2.implicits._
    // only en and fr exist; pre-fix, s_de/s_es/s_zh were NULL, every
    // `when` comparing them evaluated NULL and was skipped, and the chain
    // fell through to otherwise('zh') — EVERY doc predicted the missing
    // class. Absent classes must argmax as -2^63 (log 0 prior).
    val docs = Seq(
      (0L, "alpha beta gamma", "en"), (1L, "alpha beta gamma", "en"),
      (2L, "delta epsilon zeta", "fr"), (3L, "delta epsilon zeta", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ext.TextOps.nbClassifierOf(spark, docs, "nb_model_absent")
      .collect()
    assert(out.length == 4)
    // absent classes keep NULL scores (no fabricated numbers)...
    assert(out.forall(r => r.isNullAt(r.fieldIndex("s_zh"))))
    // ...but predictions land on PRESENT classes, correctly
    assert(out.forall(r =>
      r.getAs[String]("predicted") == r.getAs[String]("lang")))
  }

  test("text_nb_classifier scores all classes and argmaxes deterministically") {
    val out = graft.ext.TextOps.textNbClassifier(spark, SF)
    val docs = Tables.load(spark, SF, "documents")
    assert(out.count() == docs.count())
    // scores are log-probabilities scaled to e9 longs: strictly negative
    val langs = Seq("de", "en", "es", "fr", "zh")
    assert(out.filter(langs.map(l => col(s"s_$l") >= 0L).reduce(_ || _))
      .isEmpty)
    // predicted really is the alphabetical->=-chain argmax of the columns
    val chain = langs.map(l => col(s"s_$l"))
    val recomputed =
      when(chain(0) >= chain(1) && chain(0) >= chain(2) &&
           chain(0) >= chain(3) && chain(0) >= chain(4), "de")
      .when(chain(1) >= chain(2) && chain(1) >= chain(3) &&
            chain(1) >= chain(4), "en")
      .when(chain(2) >= chain(3) && chain(2) >= chain(4), "es")
      .when(chain(3) >= chain(4), "fr").otherwise("zh")
    assert(out.filter(col("predicted") =!= recomputed ||
      col("correct") =!= (col("predicted") === col("lang"))).isEmpty)
    // the fitted model separates SOMETHING: every class is predicted at
    // least once at gate SF, and train-set accuracy beats 1/#classes
    assert(out.select("predicted").distinct().count() == langs.size)
    val acc = out.agg(avg(col("correct").cast("double"))).head().getDouble(0)
    assert(acc > 1.0 / langs.size, s"train accuracy $acc")
  }

  test("embedding_quantize saturates the max element and bounds the L2 error") {
    val q = graft.ext.Similarity.embeddingQuantize(spark, SF)
    // the max-abs element quantizes to exactly +-127 -> n_sat >= 1; the
    // worst per-element residual is scale/254, so l2 <= sqrt(64)*scale/254
    assert(q.filter(col("n_sat") < 1).isEmpty)
    assert(q.filter(
      col("l2_err") > col("scale_r") * lit(8.0 / 254.0) * lit(1.000001))
      .isEmpty)
    assert(q.count() == Tables.load(spark, SF, "embeddings").count())
  }
}

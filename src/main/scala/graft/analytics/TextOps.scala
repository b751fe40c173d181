package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Text-analysis family for a training-data pipeline over `documents`:
  * token counting (whitespace + regex), quality scoring (length/punct/
  * stopword ratios), n-gram-heuristic language ID, and rolling-hash
  * document fingerprinting. All pure Column expressions — codegen'd,
  * trivially distributed, no UDFs.
  */
object TextOps extends QueryPack {

  private val duckWords = "list_filter(string_split(text, ' '), w -> length(w) > 0)"
  private def wordsCol(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** Tiny per-language stopword profiles (n-gram heuristic analog); the
    * predictor is argmax of profile hits with fixed tie-break order.
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "data"),
    "de" -> Seq("der", "die", "das", "und", "daten"),
    "fr" -> Seq("le", "la", "de", "et", "les"))

  def queries: Map[String, Query] = Map(
    "q31_token_count" -> { (s, dir) =>
      import s.implicits._
      // whitespace tokens + regex (BPE-ish alnum runs) token counts
      Tables.load(s, dir, "documents")
        .select(
          $"doc_id",
          size(wordsCol($"text")).as("n_ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_re_tokens"),
          length($"text").as("len_chars"),
          (length($"text") === $"n_chars").as("n_chars_consistent"))
        .orderBy("doc_id")
    },

    "q32_quality_score" -> { (s, dir) =>
      import s.implicits._
      val ws = wordsCol($"text")
      val nWords = size(ws)
      val stop = Seq("the", "a", "of")
      val nStop = size(filter(ws, w => w.isin(stop.map(lit): _*)))
      val nAlnumSpace = length(regexp_replace($"text", "[^a-z0-9 ]", ""))
      Tables.load(s, dir, "documents")
        .select(
          $"doc_id",
          nWords.as("n_words"),
          (length($"text").cast("double") / nWords).as("avg_word_span"),
          (nStop.cast("double") / nWords).as("stopword_ratio"),
          ((length($"text") - nAlnumSpace).cast("double") / length($"text"))
            .as("punct_ratio"))
        .withColumn("quality_tier",
          when($"n_words" < 20, "too_short")
            .when($"stopword_ratio" > 0.25, "boilerplate")
            .when($"punct_ratio" > 0.1, "noisy")
            .otherwise("clean"))
        .orderBy("doc_id")
    },

    "q33_lang_id" -> { (s, dir) =>
      import s.implicits._
      val ws = wordsCol($"text")
      val scores: Seq[(String, Column)] = langProfiles.map { case (l, prof) =>
        l -> size(filter(ws, w => w.isin(prof.map(lit): _*)))
      }
      // argmax with fixed tie-break = profile declaration order
      val best = scores.tail.foldLeft(
        struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
        case (acc, (l, sc)) =>
          when(sc > acc.getField("score"),
            struct(sc.as("score"), lit(l).as("lang"))).otherwise(acc)
      }
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang".as("labeled_lang"),
          best.getField("lang").as("predicted_lang"),
          best.getField("score").as("profile_hits"))
        .withColumn("agrees", $"predicted_lang" === $"labeled_lang")
        .orderBy("doc_id")
    },

    "q34_fingerprint" -> { (s, dir) =>
      import s.implicits._
      // position-weighted rolling checksum over characters (mod prime) —
      // a cheap shift-sensitive fingerprint. Codegen'd custom expression
      // (graft.functions.StringRollHash): the HOF formulation it replaces
      // materialized two O(len) arrays per row interpreted, the exact
      // CodegenFallback pattern ArrayDot.scala bans on the ANN path.
      // mod once at the end == mod at each step; the plain sum fits a
      // long (max ~2.8e13 for multi-KB docs). Empty text → null, matching
      // the DuckDB oracle (list_sum of an empty list is NULL).
      val weighted = when(length($"text") > 0,
        graft.functions.RollHash.rollHash($"text") % 1000000007L)
      Tables.load(s, dir, "documents")
        .select(
          $"doc_id",
          weighted.as("roll_hash"),
          length($"text").as("n"))
        .orderBy("doc_id")
    },

    // Gopher-style within-document repetition metrics: duplicate-word
    // fraction and most-frequent-bigram share. Word stats are per-row
    // array expressions (codegen'd, shuffle-free); bigram frequencies go
    // through ONE hash shuffle on (doc_id, bigram) with map-side combine
    // — bigrams are built row-local with slice+arrays_zip (both
    // codegen'd, no CodegenFallback HOF chain, no per-doc window). All
    // output ratios are single IEEE divisions of exact integers, so the
    // DuckDB hash compare is bit-stable.
    "q66_repetition_score" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", wordsCol($"text").as("words"))
      val wd = docs.select(
        $"doc_id",
        size($"words").cast("int").as("n_words"),
        size(array_distinct($"words")).cast("int").as("n_distinct_words"))
      val n = size($"words")
      val bg = docs
        .select($"doc_id", explode(
          arrays_zip(slice($"words", lit(1), greatest(n - 1, lit(0))),
            slice($"words", lit(2), greatest(n - 1, lit(0)))))
          .as("pair"))
        .select($"doc_id", concat_ws(" ", $"pair.0", $"pair.1").as("bigram"))
      val agg = bg.groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(max($"c").cast("int").as("top_bigram_count"),
          sum($"c").cast("int").as("n_bigrams"))
      wd.join(agg, Seq("doc_id"))
        .select($"doc_id", $"n_words", $"n_distinct_words",
          (lit(1.0) - $"n_distinct_words".cast("double") / $"n_words")
            .as("dup_word_frac"),
          $"top_bigram_count", $"n_bigrams",
          ($"top_bigram_count".cast("double") / $"n_bigrams")
            .as("top_bigram_frac"))
        .orderBy("doc_id")
    },

    // Inverted index over the corpus vocabulary (the IR backbone a
    // training-data lake needs for canary/contamination probes and
    // targeted takedowns: "which docs contain THIS term" without a
    // corpus scan). Build = explode (a flatMap, no shuffle) + ONE hash
    // aggregation on term with map-side combine; doc_freq is exact
    // count(distinct) inside the group. The query surfaces the RAREST
    // 500 terms — the needle-lookup tail an index exists for — with
    // min/max posting bounds; rarest-k is a TakeOrdered on (doc_freq,
    // term), no global sort. At 100 TB the same plan IS the index build:
    // posting lists partition by term, and a probe is an index equi-join
    // instead of a scan (the shape q58's contamination join already
    // uses).
    "q78_inverted_index" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", explode(wordsCol($"text")).as("term"))
        .groupBy($"term")
        .agg(
          countDistinct($"doc_id").as("doc_freq"),
          count(lit(1)).as("total_tf"),
          min($"doc_id").as("min_did"),
          max($"doc_id").as("max_did"))
        .orderBy("doc_freq", "term")
        .limit(500)
    },

    // PII redaction — the scrub pass every training-data pipeline runs
    // before tokenization. The synthetic corpus carries no PII, so it is
    // planted deterministically from doc_id (doc_id%9 → an email,
    // doc_id%13 → a 555-phone; %117 docs get both) the same way the
    // dedup tiers plant duplicates; correctness does NOT depend on the
    // planting — both engines apply identical regexes to identical
    // text, planting only guarantees the rules actually fire. Shape:
    // pure per-row Column expressions (regexp_extract_all count +
    // global regexp_replace), shuffle-free, whole-stage codegen'd — the
    // 100 TB cost is exactly one scan.
    "q70_pii_redaction" -> { (s, dir) =>
      import s.implicits._
      val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phonePat = "555-[0-9]{4}"
      val planted = Tables.load(s, dir, "documents")
        .select($"doc_id",
          when($"doc_id" % 9 === 0,
            concat($"text", lit(" reach user"), $"doc_id".cast("string"),
              lit("@example.com asap")))
            .otherwise($"text").as("t1"))
        .select($"doc_id",
          when($"doc_id" % 13 === 0,
            concat($"t1", lit(" call 555-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0"), lit(" today")))
            .otherwise($"t1").as("text"))
      // regexp_extract_all via the Column API, not expr(): the SQL-literal
      // parser would eat the \. escape and silently weaken the pattern
      planted
        .select($"doc_id",
          size(regexp_extract_all($"text", lit(emailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all($"text", lit(phonePat), lit(0))).as("n_phones"),
          md5(regexp_replace(regexp_replace($"text", emailPat, "<EMAIL>"),
            phonePat, "<PHONE>")).as("redacted_fp"))
        .withColumn("is_clean", $"n_emails" === 0 && $"n_phones" === 0)
        .orderBy("doc_id")
    }
  )

  def oracles: Map[String, String] = Map(
    "q31_token_count" ->
      s"""SELECT doc_id,
         |  len($duckWords) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
         |  length(text) AS len_chars,
         |  length(text) = n_chars AS n_chars_consistent
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q32_quality_score" ->
      s"""SELECT doc_id, n_words, avg_word_span, stopword_ratio, punct_ratio,
         |  CASE WHEN n_words < 20 THEN 'too_short'
         |       WHEN stopword_ratio > 0.25 THEN 'boilerplate'
         |       WHEN punct_ratio > 0.1 THEN 'noisy'
         |       ELSE 'clean' END AS quality_tier
         |FROM (
         |  SELECT doc_id,
         |    len($duckWords) AS n_words,
         |    CAST(length(text) AS DOUBLE) / len($duckWords) AS avg_word_span,
         |    CAST(len(list_filter($duckWords, w -> w IN ('the', 'a', 'of'))) AS DOUBLE)
         |      / len($duckWords) AS stopword_ratio,
         |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
         |      / length(text) AS punct_ratio
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q33_lang_id" -> {
      val hits = langProfiles.map { case (l, prof) =>
        s"len(list_filter($duckWords, w -> w IN (${prof.map(p => s"'$p'").mkString(", ")}))) AS hits_$l"
      }.mkString(",\n    ")
      // same fold as the Spark side: later profile wins only on strictly
      // greater score
      val (l0, _) = langProfiles.head
      val folded = langProfiles.tail.foldLeft((s"hits_$l0", s"'$l0'")) {
        case ((accScore, accLang), (l, _)) =>
          (s"(CASE WHEN hits_$l > $accScore THEN hits_$l ELSE $accScore END)",
            s"(CASE WHEN hits_$l > $accScore THEN '$l' ELSE $accLang END)")
      }
      s"""SELECT doc_id, labeled_lang, ${folded._2} AS predicted_lang,
         |  ${folded._1} AS profile_hits,
         |  ${folded._2} = labeled_lang AS agrees
         |FROM (
         |  SELECT doc_id, lang AS labeled_lang,
         |    $hits
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "q34_fingerprint" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(1, length(text)),
        |    i -> CAST(ascii(substring(text, i, 1)) AS BIGINT) * i)) % 1000000007
        |    AS BIGINT) AS roll_hash,
        |  length(text) AS n
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Independent bigram construction on purpose: the oracle pairs words
    // with a lead window over unnest positions (vs the engine's row-local
    // slice+zip). Docs with <2 words have no bigram row on either side.
    "q66_repetition_score" ->
      s"""WITH d AS (
         |  SELECT doc_id, $duckWords AS words FROM documents),
         |w AS (
         |  SELECT doc_id, unnest(words) AS w, generate_subscripts(words, 1) AS pos
         |  FROM d),
         |bg AS (
         |  SELECT doc_id,
         |    w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
         |  FROM w),
         |bgc AS (
         |  SELECT doc_id, bigram, count(*) AS c FROM bg
         |  WHERE bigram IS NOT NULL GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, max(c) AS top_bigram_count,
         |    CAST(sum(c) AS BIGINT) AS n_bigrams
         |  FROM bgc GROUP BY 1),
         |wd AS (
         |  SELECT doc_id, CAST(len(words) AS INT) AS n_words,
         |    CAST(len(list_distinct(words)) AS INT) AS n_distinct_words
         |  FROM d)
         |SELECT wd.doc_id, n_words, n_distinct_words,
         |  1.0 - CAST(n_distinct_words AS DOUBLE) / n_words AS dup_word_frac,
         |  CAST(top_bigram_count AS INT) AS top_bigram_count,
         |  CAST(n_bigrams AS INT) AS n_bigrams,
         |  CAST(top_bigram_count AS DOUBLE) / n_bigrams AS top_bigram_frac
         |FROM wd JOIN agg ON wd.doc_id = agg.doc_id
         |ORDER BY wd.doc_id""".stripMargin,

    // Same index from unnest — exact integer stats throughout.
    "q78_inverted_index" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($duckWords) AS term FROM documents)
         |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
         |  CAST(count(*) AS BIGINT) AS total_tf,
         |  min(doc_id) AS min_did, max(doc_id) AS max_did
         |FROM w GROUP BY term
         |ORDER BY doc_freq, term LIMIT 500""".stripMargin,

    // Identical planting and identical RE2-compatible regexes; DuckDB's
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // global-by-default semantics.
    "q70_pii_redaction" ->
      s"""WITH p1 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 9 = 0
         |      THEN text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com asap'
         |      ELSE text END AS t1
         |  FROM documents),
         |planted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 13 = 0
         |      THEN t1 || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
         |      ELSE t1 END AS text
         |  FROM p1)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails,
         |  len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phones,
         |  md5(regexp_replace(
         |        regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
         |        '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_fp,
         |  len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) = 0
         |    AND len(regexp_extract_all(text, '555-[0-9]{4}')) = 0 AS is_clean
         |FROM planted ORDER BY doc_id""".stripMargin
  )
}
